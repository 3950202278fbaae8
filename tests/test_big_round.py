"""ResidentTable (big-corpus round) vs the full-download SimilarityTable.

The resident path must be selection-IDENTICAL to the full path: same
optimizer output (same similarity bits feed the same host float64 grid),
same float64 score values for every clip it returns, a key set that covers
the exact selection band, and — given the same seeded rng — the exact same
clips selected for review (new, revise and finalize flavors)."""

import random

import numpy as np
import pytest

from oracles import make_sparse_problem

from videoquery.core.config import HyperParams
from videoquery.search.engine import ResidentTable, SearchEngine
from videoquery.search.selection import (
    finalize_near_miss,
    lowest_scoring_user_match,
    select_clips_to_review,
)
from test_scoring import build_index


@pytest.fixture()
def problem(rng):
    streams, splits, clip_ids, target, candidates = make_sparse_problem(
        rng, n_clips=120, p_missing=0.2
    )
    index = build_index(streams, splits, candidates, dim=16)
    return index, target, clip_ids


def _both_tables(index, target):
    engine = SearchEngine(index)
    return (engine.compute_similarities(target),
            engine.compute_similarities_resident(target))


def test_resident_optimize_matches_full(problem, rng):
    index, target, clip_ids = problem
    table, resident = _both_tables(index, target)
    hp = HyperParams()
    valid = table.scores(hp.default_weights)
    reviewed_ids = [c for c in valid][:14]
    labels = {int(c): float(rng.integers(0, 2)) for c in reviewed_ids}
    hp_full, grid_full = table.optimize(labels, hp)
    hp_res, grid_res = resident.optimize(labels, hp)
    assert hp_res.weights == hp_full.weights
    assert hp_res.threshold == hp_full.threshold
    np.testing.assert_array_equal(grid_res.losses, grid_full.losses)


def test_resident_round_scores_values_and_band(problem):
    index, target, clip_ids = problem
    table, resident = _both_tables(index, target)
    weights = {"rgb": 1.0, "warped_optical_flow": 1.5}
    full = table.scores(weights)
    th, nm = 0.6, 0.5
    red = resident.round_scores(weights, th, nm, caps=(64, 256))
    assert red is not None
    # every returned value is bit-identical to the full path's float64 score
    for cid, sc in red.items():
        assert full[cid] == sc
    # the reduced key set covers the exact selection band
    lower = th - nm * (1.0 - th)
    band = {c for c, s in full.items() if s >= lower}
    assert band <= set(red)
    # and is in canonical ascending-clip-id order
    keys = list(red)
    assert keys == sorted(keys)


def test_resident_selection_identical(problem):
    index, target, clip_ids = problem
    table, resident = _both_tables(index, target)
    weights = {"rgb": 1.0, "warped_optical_flow": 1.5}
    th, nm = 0.55, 0.6
    ref_clip = int(clip_ids[0])
    full = table.scores(weights)
    red = resident.round_scores(weights, th, nm, keep_ids=[ref_clip],
                                caps=(256,))
    want = select_clips_to_review(full, {}, ref_clip, th, 10, nm,
                                  rng=random.Random(7))
    got = select_clips_to_review(red, {}, ref_clip, th, 10, nm,
                                 rng=random.Random(7))
    assert got == want


def test_resident_finalize_identical(problem):
    """Finalize derives the near-miss band from the lowest-scoring user
    match ON DEVICE (f32, margin-widened); with the host float64 refilter in
    selection the final picks must equal the full path's."""
    from videoquery.core.config import compute_eps

    index, target, clip_ids = problem
    table, resident = _both_tables(index, target)
    weights = {"rgb": 1.0, "warped_optical_flow": 1.5}
    full = table.scores(weights)
    ranked = sorted(full, key=full.get, reverse=True)
    user_matches = {str(ranked[2]): True, str(ranked[10]): True,
                    str(ranked[4]): False}
    um_ids = [int(ranked[2]), int(ranked[10])]
    ref_clip = int(clip_ids[1])
    th = 0.7
    low, _ = lowest_scoring_user_match(full, user_matches)
    nm = finalize_near_miss(th, low, compute_eps())
    red = resident.round_scores(weights, th, 0.0,
                                keep_ids=[ref_clip] + um_ids,
                                user_match_ids=um_ids, finalize=True,
                                caps=(256,))
    # the reduced dict reproduces the finalize near-miss inputs exactly
    low_red, _ = lowest_scoring_user_match(red, user_matches)
    assert low_red == low
    import math

    want = select_clips_to_review(full, user_matches, ref_clip, th, math.inf,
                                  nm, rng=random.Random(3))
    got = select_clips_to_review(red, user_matches, ref_clip, th, math.inf,
                                 nm, rng=random.Random(3))
    assert got == want


def test_resident_cap_overflow_returns_none(problem):
    index, target, clip_ids = problem
    _, resident = _both_tables(index, target)
    weights = {"rgb": 1.0, "warped_optical_flow": 1.5}
    # a band low enough to cover everything, caps too small to hold it
    red = resident.round_scores(weights, -10.0, 0.0, caps=(4, 8))
    assert red is None
    # the fallback full table matches compute_similarities
    table = resident.to_table()
    full = SearchEngine(index).compute_similarities(target)
    np.testing.assert_array_equal(table.avg_sim, full.avg_sim)
    np.testing.assert_array_equal(table.counts, full.counts)


def test_group_round_scores_cap_overflow_escalates_solo(problem):
    """round_scores_many: a query whose candidate band exceeds the group
    cap must retry solo at the escalated caps and still match the solo
    path bit-for-bit (the group download stays one program for the
    others)."""
    import numpy as np

    from videoquery.search.engine import SearchEngine, round_scores_many

    index, target, clip_ids = problem
    engine = SearchEngine(index)
    # two targets -> a real batch parent; low threshold makes the band huge
    tables = engine.compute_similarities_multi([target, target],
                                               resident=True)
    weights = {"rgb": 1.0, "warped_optical_flow": 1.5}
    wide = {"weights": weights, "threshold": -1.0, "near_miss": 0.0,
            "keep_ids": [int(clip_ids[0])], "user_match_ids": [],
            "finalize": False}
    narrow = {"weights": weights, "threshold": 0.9, "near_miss": 0.1,
              "keep_ids": [int(clip_ids[0])], "user_match_ids": [],
              "finalize": False}
    # caps: group cap 8 (the wide band overflows it), escalation 4096
    got = round_scores_many(tables, [wide, narrow], caps=(8, 4096))
    solo_wide = tables[0].round_scores(
        weights, wide["threshold"], wide["near_miss"], wide["keep_ids"],
        [], finalize=False, caps=(8, 4096))
    solo_narrow = tables[1].round_scores(
        weights, narrow["threshold"], narrow["near_miss"],
        narrow["keep_ids"], [], finalize=False, caps=(8, 4096))
    assert got[0] == solo_wide and len(got[0]) > 8
    assert got[1] == solo_narrow
    # a band wider than EVERY cap returns None like the solo path
    got_none = round_scores_many(tables, [wide, narrow], caps=(8,))
    assert got_none[0] is None
    assert got_none[1] == tables[1].round_scores(
        weights, narrow["threshold"], narrow["near_miss"],
        narrow["keep_ids"], [], finalize=False, caps=(8,))
