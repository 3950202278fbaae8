"""Multi-process streaming producer (pipeline/mpstream.py — VERDICT r3 #2).

Worker processes decode distinct videos and stream payloads to the
dispatching process; results must equal the single-process streaming path
exactly (same payload builder, same device programs)."""

import os

import numpy as np
import pytest

from videoquery.core.config import ExtractionConfig
from videoquery.pipeline import decode
from videoquery.pipeline.extract import Extractor, stream_payloads


@pytest.fixture(scope="module")
def small_world(tmp_path_factory):
    import jax

    from videoquery.nn.tsn import TwoStreamTSN

    tmp = tmp_path_factory.mktemp("mpstream")
    # two videos, one with a tail clip (50 = 2 full x 20 + 10-frame tail
    # at fps 5 / clip 4 s / min tail 2 s)
    paths = []
    for i, n in enumerate((80, 50)):
        p = str(tmp / f"v{i}.mp4")
        decode.synthesize_video(p, n_frames=n, size=(176, 128))
        paths.append(p)
    cfg = ExtractionConfig(fps=5, clip_seconds=4, num_ticks=5,
                           batch_clips=2, host_gray=True, host_crop=True,
                           host_yuv420=True)
    tsn = TwoStreamTSN.random(jax.random.PRNGKey(0), splits=(1,))
    ex = Extractor(tsn, cfg, warped=False,
                   tvl1=None)
    return paths, ex


def _flat(sigs):
    return {
        n: (np.asarray(s.rgb)[:, i], np.asarray(s.flow)[:, i])
        for s in sigs for i, n in enumerate(s.clip_numbers)
    }


def test_mp_matches_single_process_streaming(small_world):
    paths, ex = small_world
    by_path = ex.extract_videos(paths, workers=2)
    for p in paths:
        ref = ex.extract_video_stream(p)
        got = _flat(by_path[p])
        want = _flat(ref)
        assert sorted(got) == sorted(want)
        for n in want:
            np.testing.assert_array_equal(got[n][0], want[n][0])
            np.testing.assert_array_equal(got[n][1], want[n][1])


def test_mp_single_worker_and_order(small_world):
    paths, ex = small_world
    by_path = ex.extract_videos(paths, workers=1)
    for p, sigs in by_path.items():
        nums = [n for s in sigs for n in s.clip_numbers]
        assert nums == sorted(nums)
    # video 1 (50 frames): 2 full clips + 1 tail
    assert sum(len(s.clip_numbers) for s in by_path[paths[1]]) == 3


def test_mp_decode_failure_raises_after_others_finish(small_world, tmp_path):
    paths, ex = small_world
    bad = str(tmp_path / "bad.mp4")
    with open(bad, "wb") as f:
        f.write(b"not a video")
    with pytest.raises(RuntimeError, match="1/3 videos failed"):
        ex.extract_videos(list(paths) + [bad], workers=2)


def test_stream_payloads_constant_window(small_world):
    """The generator frees consumed frames: after the first full batch is
    yielded, its frames are None in the internal buffer. Verified
    indirectly — payload frame content must match a whole-video load."""
    paths, ex = small_world
    frames = decode.load_video(paths[0], new_size=ex._decode_size())
    pls = list(stream_payloads(paths[0], ex.cfg, ex.flow_res_div,
                               ex._decode_size()))
    nums = [n for pl in pls for n in pl.nums]
    assert sorted(nums) == list(range(1, len(nums) + 1))
    # every payload's gray matches gray computed from the full decode
    from videoquery.pipeline.extract import build_payload, plan_groups

    groups = plan_groups(len(frames), ex.cfg)
    by_num = {n: pl for pl in pls for n in pl.nums}
    for group, gnums in groups:
        ref = build_payload(frames, None, group, gnums, ex.cfg,
                            ex.flow_res_div)
        pl = by_num[gnums[0]]
        np.testing.assert_array_equal(pl.gray, ref.gray)
        np.testing.assert_array_equal(pl.clip_rgb, ref.clip_rgb)


# ---- dispatcher machinery with throttled synthetic producers -------------
# (sleep-based payload stubs overlap across worker processes even on a
# single-core host, so aggregate-producer scaling is measurable in CI;
# VERDICT r4 #4)

import time

from videoquery.pipeline.mpstream import WorkerPool, stream_dispatch

STUB = "videoquery.testing.mp_stubs:throttled_payloads"


def _mk_pool(workers):
    return WorkerPool(workers, ExtractionConfig(), 2, None,
                      payload_spec=STUB, queue_window=64)


def _run(pool, paths):
    t0 = time.monotonic()
    results, errors = stream_dispatch(pool, paths, dispatch=lambda p: p)
    return time.monotonic() - t0, results, errors


def test_throttled_producers_scale():
    """3 decode workers must stream ~3x the aggregate payload rate of 1
    (the multi-core scaling claim, demonstrated without real cores)."""
    paths = ["throttle:4:0.05"] * 6  # 6 videos x 4 payloads x 50 ms
    with _mk_pool(1) as pool1:
        t1, r1, e1 = _run(pool1, paths)
        t1b, _, _ = _run(pool1, paths)  # warm re-run, same pool
        t1 = min(t1, t1b)
    with _mk_pool(3) as pool3:
        t3, r3, e3 = _run(pool3, paths)
        t3b, _, _ = _run(pool3, paths)
        t3 = min(t3, t3b)
    assert not e1 and not e3
    assert all(len(v) == 4 for v in r1.values())
    assert all(len(v) == 4 for v in r3.values())
    # 24 x 50 ms serial = 1.2 s vs ~0.4 s on 3 workers; allow queue slop
    assert t3 < t1 / 1.8, (t1, t3)
    # ...and the 3-worker run really used 3 distinct processes
    pids = {p["pid"] for v in r3.values() for p in v}
    assert len(pids) == 3


def test_persistent_pool_reuses_workers_across_calls():
    with _mk_pool(2) as pool:
        _, r1, e1 = _run(pool, ["throttle:2:0.01"] * 3)
        pids1 = {p["pid"] for v in r1.values() for p in v}
        _, r2, e2 = _run(pool, ["throttle:3:0.01"] * 2)
        pids2 = {p["pid"] for v in r2.values() for p in v}
    assert not e1 and not e2
    assert len(r2) == 2 and all(len(v) == 3 for v in r2.values())
    assert pids2 <= pids1  # same fleet, no respawn


def test_dead_worker_fails_video_instead_of_hanging():
    """A worker that dies without posting an error (segfault model) must
    fail its video after liveness detection, not hang the dispatcher —
    and the healthy worker's videos still complete."""
    with _mk_pool(2) as pool:
        t0 = time.monotonic()
        results, errors = stream_dispatch(
            pool, ["throttle:3:0.01:die", "throttle:40:0.01"],
            dispatch=lambda p: p)
        wall = time.monotonic() - t0
    assert len(errors) == 1 and "died without reporting" in errors[0]
    assert len(results[1]) == 40  # the healthy video completed
    assert wall < 60, wall


def test_worker_error_reported_per_video():
    with _mk_pool(2) as pool:
        results, errors = stream_dispatch(
            pool, ["throttle:4:0.01:fail", "throttle:4:0.01"],
            dispatch=lambda p: p)
    assert len(errors) == 1 and "synthetic decode failure" in errors[0]
    assert len(results[1]) == 4
