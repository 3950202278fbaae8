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
