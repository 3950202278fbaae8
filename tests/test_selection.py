"""Match/near-miss selection semantics + seeded reproducibility."""

import math
import random

import numpy as np
import pytest

from videoquery.search.selection import (
    finalize_near_miss,
    lowest_scoring_user_match,
    select_clips_to_review,
)


def make_scores(rng, n=200):
    ids = sorted(rng.choice(100_000, size=n, replace=False).tolist())
    return {int(i): float(s) for i, s in zip(ids, rng.uniform(0.0, 1.0, n))}


def test_selection_counts_and_bands(rng):
    scores = make_scores(rng)
    th, near, mx = 0.8, 0.5, 20
    out = select_clips_to_review(scores, {}, None, th, mx, near,
                                 rng=random.Random(0))
    lower = th - near * (1 - th)
    assert len(out) <= mx
    for clip, s in out.items():
        assert s >= lower
        assert scores[clip] == s


def test_best_near_miss_always_kept(rng):
    scores = make_scores(rng)
    th, near = 0.8, 0.5
    lower = th - near * (1 - th)
    near_cands = {k: v for k, v in scores.items() if lower <= v < th}
    if not near_cands:
        pytest.skip("no near candidates in draw")
    best = max(near_cands, key=lambda k: near_cands[k])
    out = select_clips_to_review(scores, {}, None, th, 20, near,
                                 rng=random.Random(1))
    n_near_budget = 20 - int(min(20 / 2, sum(v >= th for v in scores.values())))
    if n_near_budget > 0:
        assert best in out


def test_ref_clip_and_user_matches_reincluded(rng):
    scores = make_scores(rng)
    ref_clip = list(scores)[3]
    user_clip = list(scores)[7]
    out = select_clips_to_review(
        scores,
        {str(user_clip): True, str(list(scores)[9]): False},
        ref_clip,
        0.99, 4, 0.1,
        rng=random.Random(2),
    )
    assert ref_clip in out
    assert user_clip in out


def test_finalize_selects_all_matches(rng):
    """max_number_matches = inf on finalize jobs selects every candidate
    above threshold (compute_matches.py:79)."""
    scores = make_scores(rng)
    th = 0.5
    out = select_clips_to_review(scores, {}, None, th, math.inf, 0.0,
                                 rng=random.Random(3))
    above = {k for k, v in scores.items() if v >= th}
    assert above <= set(out)


def test_seeded_reproducibility(rng):
    scores = make_scores(rng)
    a = select_clips_to_review(scores, {}, None, 0.8, 20, 0.5, rng=random.Random(42))
    b = select_clips_to_review(scores, {}, None, 0.8, 20, 0.5, rng=random.Random(42))
    assert a == b
    c = select_clips_to_review(scores, {}, None, 0.8, 20, 0.5, rng=random.Random(43))
    # overwhelmingly likely to differ
    assert a != c or len(scores) < 25


def test_lowest_scoring_user_match():
    scores = {1: 0.9, 2: 0.7, 3: 0.95, 4: 0.2}
    um = {"1": True, "3": True, "4": False}
    low, clip = lowest_scoring_user_match(scores, um)
    assert low == 0.9
    assert clip == 1


def test_lowest_scoring_no_user_matches():
    low, clip = lowest_scoring_user_match({1: 0.5}, {})
    assert low == 1.0 and clip is None


def test_finalize_near_miss_guard():
    eps = 1e-6
    # threshold ~ 1: denominator guarded by eps (compute_matches.py:84)
    nm = finalize_near_miss(1.0, 0.9, eps)
    np.testing.assert_allclose(nm, 0.1 / eps)
    assert finalize_near_miss(0.8, 0.9, eps) == 0.0
    np.testing.assert_allclose(finalize_near_miss(0.8, 0.6, eps), 0.2 / 0.2)
