"""Real 2-process jax.distributed execution (VERDICT r3 #4 / A8).

Everything multi-chip elsewhere in the suite runs in ONE process over
virtual devices; this test spawns two OS processes, each owning 4 virtual
CPU devices, joined through jax.distributed.initialize (Gloo CPU
collectives) into one 8-device mesh — the DCN-style boundary of a real
multi-host pod. Both workers run the sharded search + a train step whose
collectives cross the process boundary, and their results must agree with
each other AND with the same world computed in this (single) process.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    """Spawn the 2 workers once; several tests assert on the outputs."""
    tmp = tmp_path_factory.mktemp("mh")
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count (4)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    outs = []
    for pid in range(2):
        out = str(tmp / f"r{pid}.json")
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "videoquery.testing.multihost_worker",
             "--coordinator", f"127.0.0.1:{port}", "--nprocs", "2",
             "--pid", str(pid), "--out", out],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out (coordinator hang?)")
        logs.append(stdout)
    for p, lg in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{lg[-3000:]}"
    return [json.load(open(o)) for o in outs]


def test_two_process_mesh_comes_up(worker_results):
    for r in worker_results:
        assert r["device_count"] == 8
        assert r["local_devices"] == 4


def test_workers_agree(worker_results):
    r0, r1 = worker_results
    assert r0["topk_ids"] == r1["topk_ids"]
    np.testing.assert_allclose(r0["topk_vals"], r1["topk_vals"], rtol=1e-6)
    np.testing.assert_allclose(
        [r0["loss"], r0["loss2"]], [r1["loss"], r1["loss2"]], rtol=1e-6)


def test_matches_single_process(worker_results):
    """The 2-process world must equal the same world on this process's
    8 virtual devices (conftest) — the sharding is the program, the
    process boundary must not change the math."""
    import jax

    from videoquery.testing.multihost_worker import run_world

    if jax.device_count() < 8:
        pytest.skip("conftest did not provide 8 virtual devices")
    ref = run_world(jax)
    for r in worker_results:
        assert r["topk_ids"] == ref["topk_ids"]
        np.testing.assert_allclose(r["topk_vals"], ref["topk_vals"],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(r["loss"], ref["loss"], rtol=1e-5)
        np.testing.assert_allclose(r["loss2"], ref["loss2"], rtol=1e-5)
