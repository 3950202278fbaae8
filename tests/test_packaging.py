"""Packaging verification (SURVEY.md C16; round-4 VERDICT missing #4).

Builds the real wheel, pip-installs it into a FRESH venv (system
site-packages only for the baked third-party deps — the repo itself is NOT
on the path), and exercises the installed package: a full broker round
against the in-process fake API, the loader's CSV parser, and the
extraction CLI entry point. This is the wheel-level analogue of the
reference's four Dockerfiles (Broker_Dockerfile:1-21,
src/features_GPU_compute/Dockerfile:1-67); deploy/Dockerfile.* install the
same wheel (`pip install .`) on top of their runtime deps.
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def venv_python(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pkg")
    dist = tmp / "dist"
    build = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", ".", "--no-deps",
         "--no-build-isolation", "-w", str(dist)],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    assert build.returncode == 0, build.stdout + build.stderr
    wheels = list(dist.glob("videoquery-*.whl"))
    assert len(wheels) == 1, wheels

    venv_dir = tmp / "venv"
    subprocess.run(
        [sys.executable, "-m", "venv", str(venv_dir)],
        check=True, timeout=120,
    )
    py = str(venv_dir / "bin" / "python")
    install = subprocess.run(
        [py, "-m", "pip", "install", "--no-deps", "--no-index",
         str(wheels[0])],
        capture_output=True, text=True, timeout=300,
    )
    assert install.returncode == 0, install.stdout + install.stderr
    # Third-party deps (jax/numpy/cv2) are baked into THIS interpreter's
    # site-packages and there is no network to pip-install them fresh —
    # expose them to the venv via a .pth (ordered AFTER the venv's own
    # site-packages, so the wheel is the only videoquery on the path).
    import sysconfig

    parent_site = sysconfig.get_paths()["purelib"]
    site_dirs = subprocess.run(
        [py, "-c", "import site; print(site.getsitepackages()[0])"],
        capture_output=True, text=True, check=True, timeout=60,
    ).stdout.strip()
    with open(os.path.join(site_dirs, "_parent_deps.pth"), "w") as f:
        f.write(parent_site + "\n")
    return py


def run_in_venv(py, code, cwd, timeout=420):
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    env["COMPUTE_EPS"] = "1e-6"
    return subprocess.run([py, "-c", code], cwd=str(cwd), env=env,
                          capture_output=True, text=True, timeout=timeout)


def test_wheel_imports_resolve_outside_repo(venv_python, tmp_path):
    r = run_in_venv(venv_python, textwrap.dedent("""
        import videoquery, os
        # the import must come from the venv, not the repo checkout
        assert "site-packages" in videoquery.__file__, videoquery.__file__
        from videoquery.service import broker, loader
        from videoquery.pipeline import extract
        from videoquery.search import engine
        print("ok", videoquery.__file__)
    """), cwd=tmp_path, timeout=180)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "ok" in r.stdout


def test_installed_broker_processes_a_job(venv_python, tmp_path):
    """Full serving round from the INSTALLED wheel: fake API in-process,
    one new-query job -> state 4 + a query_result + match rows."""
    r = run_in_venv(venv_python, textwrap.dedent("""
        import random
        import numpy as np
        import jax
        jax.config.update("jax_platforms", "cpu")
        from videoquery.core.config import HyperParams, STATE_PROCESSED
        from videoquery.service.compute_matches import compute_matches
        from videoquery.service.repository import APIRepository
        from videoquery.testing.fake_api import FakeAPI, FakeClient

        rng = np.random.default_rng(0)
        api = FakeAPI()
        video = api.add_video("v", "")
        clip_ids = []
        for i in range(20):
            c = api.add_clip(video["id"], i + 1)
            clip_ids.append(c["id"])
            for s in ("rgb", "warped_optical_flow"):
                for split in (1, 2, 3):
                    api.add_feature(c["id"], s, split,
                                    rng.standard_normal(32))
        search = api.add_search_set("all", clip_ids)
        q = api.add_query("q1", video["id"], 1, clip_ids[0], search["id"])
        compute_matches(APIRepository(FakeClient(api), "fake://"),
                        HyperParams(), seed=0, report_dir="reports")
        assert api.queries[q["id"]]["process_state"] == STATE_PROCESSED, \
            api.queries[q["id"]]
        assert any(r["query"] == q["id"]
                   for r in api.query_results.values())
        assert api.matches, "no match rows written"
        print("broker ok:", len(api.matches), "matches")
    """), cwd=tmp_path)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "broker ok" in r.stdout


def test_installed_extraction_cli_on_synthetic_video(venv_python, tmp_path):
    """The extraction CLI entry point from the wheel: synthesize a tiny
    mp4 with cv2, extract, and check the reference-format CSVs appear
    (calcSig_wOF.py:116-134 contract)."""
    pytest.importorskip("cv2")
    r = run_in_venv(venv_python, textwrap.dedent("""
        import os, subprocess, sys
        import numpy as np, cv2
        import jax
        jax.config.update("jax_platforms", "cpu")
        path = "synth.mp4"
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5,
                            (96, 72))
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 255, (72, 96, 3)).astype(np.uint8)
        for i in range(25):
            M = np.float32([[1, 0, 0.6 * i], [0, 1, 0]])
            w.write(cv2.warpAffine(img, M, (96, 72)))
        w.release()
        from videoquery.pipeline.extract import main
        sys.argv = ["extract", path, "--out", "out", "--fps", "5",
                    "--clip_time", "4", "--num_ticks", "3", "--splits", "1"]
        main()
        csvs = []
        for root, _, files in os.walk("out"):
            csvs += [f for f in files if f.endswith("_features.csv")]
        assert sorted(csvs) == ["rgb_global_pool_features.csv",
                                "warped_optical_flow_global_pool_features.csv"], csvs
        print("extract ok")
    """), cwd=tmp_path, timeout=420)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "extract ok" in r.stdout


def test_dockerfiles_install_the_project():
    """Config lint: every deploy image must install the package (the
    round-4 VERDICT caught COPY-without-install) and compose must reference
    only Dockerfiles that exist."""
    deploy = os.path.join(REPO, "deploy")
    for name in ("Dockerfile.broker", "Dockerfile.load_db",
                 "Dockerfile.extract"):
        text = open(os.path.join(deploy, name)).read()
        assert "pip install" in text and " .\n" in text.replace(
            "--no-deps .", " .\n"), f"{name} never installs the project"
        assert "COPY videoquery" in text
    compose = open(os.path.join(deploy, "docker-compose.yml")).read()
    import re

    for m in re.finditer(r"dockerfile:\s*(\S+)", compose):
        ref = m.group(1)
        assert os.path.exists(os.path.join(deploy, os.path.basename(ref))), ref
