"""Target estimation / bootstrap math vs oracles and analytic properties."""

import random

import numpy as np
import pytest

from videoquery.core.config import HyperParams
from videoquery.search.target import (
    TargetEstimator,
    random_fraction,
    scale_feature,
    scaled_ref_features,
    simple_bootstrap,
    valid_plus_invalid_bootstrap,
)

from oracles import oracle_simple_bootstrap, oracle_valid_plus_invalid


def test_scale_feature_unit_self_dot(rng):
    f = rng.uniform(0.1, 5.0, size=1024)
    t = scale_feature(f)
    np.testing.assert_allclose(np.dot(t, f), 1.0, rtol=1e-12)


def test_simple_bootstrap_matches_oracle(rng):
    F = rng.normal(size=(5, 64))
    np.testing.assert_allclose(simple_bootstrap(F), oracle_simple_bootstrap(F),
                               rtol=1e-9, atol=1e-12)


def test_simple_bootstrap_interpolates_matches(rng):
    """The least-squares target satisfies F w = 1 exactly when n < D and rows
    are independent: every validated match scores dot = 1 against the new
    target (the defining property, SURVEY.md Appendix B)."""
    F = rng.normal(size=(6, 32))
    w = simple_bootstrap(F)
    np.testing.assert_allclose(F @ w, np.ones(6), atol=1e-8)


def test_valid_plus_invalid_matches_oracle(rng):
    X = rng.normal(size=(4, 48))
    Y = rng.normal(size=(3, 48))
    got = valid_plus_invalid_bootstrap(X, Y, mu=0.3)
    want = oracle_valid_plus_invalid(X, Y, mu=0.3)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


def test_valid_plus_invalid_mu_zero_reduces_to_simple(rng):
    """mu = 0 (the broker default, broker.py:47) removes the invalid-match
    penalty entirely."""
    X = rng.normal(size=(4, 48))
    Y = rng.normal(size=(3, 48))
    got = valid_plus_invalid_bootstrap(X, Y, mu=0.0)
    np.testing.assert_allclose(got, simple_bootstrap(X), rtol=1e-8, atol=1e-10)


def test_valid_plus_invalid_keeps_interpolation(rng):
    """Whatever mu does to the invalid-match term, the KKT solution must keep
    the validated matches interpolating to exactly 1 (the Xw = 1 constraint
    is enforced through the (X M^-1 X^T)^-1 block)."""
    X = rng.normal(size=(4, 48))
    Y = rng.normal(size=(3, 48))
    w1 = valid_plus_invalid_bootstrap(X, Y, mu=10.0)
    np.testing.assert_allclose(X @ w1, np.ones(4), atol=1e-8)
    # and mu must actually change the solution
    w0 = valid_plus_invalid_bootstrap(X, Y, mu=0.0)
    assert not np.allclose(w0, w1)


def test_random_fraction_semantics():
    items = list(range(10))
    r = random.Random(0)
    out = random_fraction(items, 0.5, replacement=False, rng=r)
    assert len(out) == 5 and len(set(out)) == 5
    out = random_fraction(items, 0.05, replacement=False, rng=r)
    assert len(out) == 1  # at least one item (target_clip.py:303)
    out = random_fraction(items, 1.0, replacement=True, rng=r)
    assert len(set(out)) == len(out)  # replacement draws deduplicated


def make_feature_dicts(rng, n, streams, splits, dim):
    return [
        {s: {k: rng.normal(size=dim).tolist() for k in splits} for s in streams}
        for _ in range(n)
    ]


def test_estimator_no_bootstrap_scales_ref(rng):
    hp = HyperParams(bootstrap_type="simple")
    est = TargetEstimator(hp, rng=random.Random(0))
    splits = {1, 2}
    ref = {s: {k: rng.uniform(0.1, 2.0, 8) for k in splits} for s in hp.streams}
    out = est.estimate(ref, [], [], splits, previous_target=None, bootstrap=False)
    for s in hp.streams:
        for k in splits:
            np.testing.assert_allclose(
                np.dot(out[s][k], ref[s][k]), 1.0, rtol=1e-10
            )


def test_estimator_simple(rng):
    hp = HyperParams(bootstrap_type="simple", f_bootstrap=1.0)
    est = TargetEstimator(hp, rng=random.Random(0))
    splits = {1}
    valid = make_feature_dicts(rng, 5, hp.streams, splits, 24)
    ref = {s: {1: rng.normal(size=24)} for s in hp.streams}
    out = est.estimate(ref, valid, [], splits, previous_target={"x": 1}, bootstrap=True)
    F = np.asarray([fd[hp.streams[0]][1] for fd in valid])
    np.testing.assert_allclose(out[hp.streams[0]][1], simple_bootstrap(F),
                               rtol=1e-9)


def test_estimator_partial_update_ema(rng):
    hp = HyperParams(bootstrap_type="partial_update", f_memory=0.7, f_bootstrap=1.0)
    est = TargetEstimator(hp, rng=random.Random(0))
    splits = {1}
    valid = make_feature_dicts(rng, 5, hp.streams, splits, 24)
    prev = {s: {1: rng.normal(size=24).tolist()} for s in hp.streams}
    ref = {s: {1: rng.normal(size=24)} for s in hp.streams}
    out = est.estimate(ref, valid, [], splits, previous_target=prev, bootstrap=True)
    F = np.asarray([fd[hp.streams[0]][1] for fd in valid])
    fresh = simple_bootstrap(F)
    want = 0.7 * fresh + 0.3 * np.asarray(prev[hp.streams[0]][1])
    np.testing.assert_allclose(out[hp.streams[0]][1], want, rtol=1e-9)


def test_estimator_bagging_is_average_of_bags(rng):
    hp = HyperParams(bootstrap_type="bagging", nbags=3)
    splits = {1}
    valid = make_feature_dicts(rng, 6, hp.streams, splits, 24)
    ref = {s: {1: rng.normal(size=24)} for s in hp.streams}

    est = TargetEstimator(hp, rng=random.Random(7))
    out = est.estimate(ref, valid, [], splits, previous_target={"x": 1}, bootstrap=True)

    # replay the draws with the same seed
    r = random.Random(7)
    bags = []
    for _ in range(hp.nbags):
        draws = sorted(set(r.choices(range(6), k=6)))
        F = np.asarray([valid[i][hp.streams[0]][1] for i in draws])
        bags.append(simple_bootstrap(F))
    np.testing.assert_allclose(out[hp.streams[0]][1], np.mean(bags, axis=0),
                               rtol=1e-9)


def test_estimator_no_valid_matches_falls_back(rng):
    hp = HyperParams(bootstrap_type="bagging")
    est = TargetEstimator(hp, rng=random.Random(0))
    ref = {s: {1: rng.uniform(0.5, 1.0, 8)} for s in hp.streams}
    out = est.estimate(ref, [], [], {1}, previous_target={"x": 1}, bootstrap=True)
    want = scaled_ref_features(ref)
    for s in hp.streams:
        np.testing.assert_allclose(out[s][1], want[s][1])
