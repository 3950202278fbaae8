"""Batched similarity/scoring vs the dict-and-loop oracle."""

import os

import numpy as np
import pytest

from conftest import REFERENCE_FIXTURES

from videoquery.index.store import FeatureIndex, FeatureRecord
from videoquery.search.engine import SearchEngine

from oracles import (
    make_sparse_problem,
    oracle_scores,
    oracle_similarities,
)


def build_index(streams, splits, candidates, dim):
    records = [
        FeatureRecord(c, s, k, "global_pool", np.asarray(v))
        for s in streams
        for k in splits
        for c, v in candidates[s][k].items()
    ]
    return FeatureIndex.build(records, streams, splits, feature_dim=dim)


@pytest.mark.parametrize("p_missing", [0.0, 0.25, 0.6])
def test_similarities_match_oracle(rng, p_missing):
    streams, splits, clip_ids, target, candidates = make_sparse_problem(
        rng, p_missing=p_missing
    )
    index = build_index(streams, splits, candidates, dim=16)
    table = SearchEngine(index).compute_similarities(target)
    got = table.similarities_dict()
    want = oracle_similarities(target, candidates)
    assert set(got) == set(want)
    for clip in want:
        assert set(got[clip]) == set(want[clip])
        for stream in want[clip]:
            np.testing.assert_allclose(
                got[clip][stream][0], want[clip][stream][0], rtol=2e-6, atol=1e-7
            )
            assert got[clip][stream][1] == want[clip][stream][1]


def test_scores_match_oracle(rng):
    streams, splits, clip_ids, target, candidates = make_sparse_problem(rng)
    index = build_index(streams, splits, candidates, dim=16)
    table = SearchEngine(index).compute_similarities(target)
    weights = {"rgb": 1.0, "warped_optical_flow": 1.5}
    got = table.scores(weights)
    sims = oracle_similarities(target, candidates)
    # only clips with every stream present are scoreable (the reference
    # KeyErrors otherwise)
    both = {c: v for c, v in sims.items() if set(v) == set(streams)}
    want = oracle_scores(both, weights)
    assert set(got) == set(want)
    for clip in want:
        np.testing.assert_allclose(got[clip], want[clip], rtol=1e-5, atol=1e-6)


def test_scores_sorted_by_clip_id(rng):
    streams, splits, clip_ids, target, candidates = make_sparse_problem(rng)
    index = build_index(streams, splits, candidates, dim=16)
    table = SearchEngine(index).compute_similarities(target)
    got = table.scores({"rgb": 1.0, "warped_optical_flow": 1.5})
    keys = list(got)
    assert keys == sorted(keys)


def test_score_golden_value():
    """Hand-computed score: sims rgb=0.9, flow=0.7, w=(1.0, 1.5):
    score = 1 - sqrt((1*0.1)^2 + (1.5*0.3)^2) / sqrt(1 + 2.25)."""
    dim = 4
    t = np.zeros(dim)
    t[0] = 1.0
    cands = {
        "rgb": {1: {10: np.asarray([0.9, 0, 0, 0])}},
        "warped_optical_flow": {1: {10: np.asarray([0.7, 0, 0, 0])}},
    }
    target = {"rgb": {1: t}, "warped_optical_flow": {1: t}}
    index = build_index(["rgb", "warped_optical_flow"], [1], cands, dim)
    table = SearchEngine(index).compute_similarities(target)
    got = table.scores({"rgb": 1.0, "warped_optical_flow": 1.5})
    want = 1.0 - np.sqrt((0.1 ** 2 + (1.5 * 0.3) ** 2) / (1.0 + 1.5 ** 2))
    np.testing.assert_allclose(got[10], want, rtol=1e-6)


def _load_reference_fixture(root):
    import os

    from videoquery.index.csvio import read_feature_tree

    if not os.path.isdir(root):
        pytest.skip("reference fixtures unavailable")
    records, ref_vecs = [], {}
    for video, split, csvf in read_feature_tree(root):
        for clip_no, vec in zip(csvf.clip_numbers, csvf.features):
            records.append(
                FeatureRecord(int(clip_no), csvf.stream, split, csvf.feature_blob, vec)
            )
            if clip_no == 1:
                ref_vecs.setdefault(csvf.stream, {})[split] = vec
    return records, ref_vecs


def test_reference_fixture_self_similarity_exact():
    """Exact (float64 host) mode: a clip scores exactly 1.0 against its own
    scaled features — the reference-parity numerics path."""
    from videoquery.search.target import scale_feature

    records, ref_vecs = _load_reference_fixture(
        os.path.join(REFERENCE_FIXTURES, "stock-video-clips_features")
    )
    streams = ("rgb", "warped_optical_flow")
    index = FeatureIndex.build(records, streams, feature_dim=1024, keep_host=True)
    target = {
        s: {k: scale_feature(v) for k, v in kd.items()} for s, kd in ref_vecs.items()
    }
    table = SearchEngine(index, exact=True).compute_similarities(target)
    scores = table.scores({"rgb": 1.0, "warped_optical_flow": 1.5})
    np.testing.assert_allclose(scores[1], 1.0, atol=1e-12)
    assert all(s <= 1.0 + 1e-12 for s in scores.values())


def test_reference_fixture_device_vs_exact_ranking():
    """The f32 device path must rank the fixture clips identically to the
    float64 exact path (the identical-top-k requirement at realistic score
    separations), with small absolute score error."""
    from videoquery.search.target import scale_feature

    records, ref_vecs = _load_reference_fixture(
        os.path.join(REFERENCE_FIXTURES, "stock-video-clips_features")
    )
    streams = ("rgb", "warped_optical_flow")
    index = FeatureIndex.build(records, streams, feature_dim=1024, keep_host=True)
    target = {
        s: {k: scale_feature(v) for k, v in kd.items()} for s, kd in ref_vecs.items()
    }
    weights = {"rgb": 1.0, "warped_optical_flow": 1.5}
    fast = SearchEngine(index).compute_similarities(target).scores(weights)
    exact = SearchEngine(index, exact=True).compute_similarities(target).scores(weights)
    assert set(fast) == set(exact)
    for clip in exact:
        np.testing.assert_allclose(fast[clip], exact[clip], atol=5e-4)
    rank_fast = sorted(fast, key=lambda c: (-fast[c], c))
    rank_exact = sorted(exact, key=lambda c: (-exact[c], c))
    assert rank_fast[:10] == rank_exact[:10]


def test_golden_topk_snapshot():
    """Frozen float64 top-10 over the vendored corpus: any numerics change
    in the exact engine or the CSV reader breaks this, loudly (it FAILS
    rather than skips — the snapshot and fixtures ship with the repo)."""
    import json

    from videoquery.search.target import scale_feature

    snap_path = os.path.join(os.path.dirname(REFERENCE_FIXTURES),
                             "golden_topk.json")
    with open(snap_path) as f:
        snap = json.load(f)
    records, ref_vecs = [], {}
    from videoquery.index.csvio import read_feature_tree

    root = os.path.join(REFERENCE_FIXTURES, snap["corpus"])
    for video, split, csvf in read_feature_tree(root):
        for clip_no, vec in zip(csvf.clip_numbers, csvf.features):
            records.append(FeatureRecord(int(clip_no), csvf.stream, split,
                                         csvf.feature_blob, vec))
            if clip_no == snap["target_clip"]:
                ref_vecs.setdefault(csvf.stream, {})[split] = vec
    streams = ("rgb", "warped_optical_flow")
    index = FeatureIndex.build(records, streams, feature_dim=1024,
                               keep_host=True)
    target = {s: {k: scale_feature(v) for k, v in kd.items()}
              for s, kd in ref_vecs.items()}
    scores = SearchEngine(index, exact=True).compute_similarities(
        target).scores(snap["weights"])
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [{"clip": int(c), "score": repr(float(s))} for c, s in top]
    assert got == snap["top10"]
