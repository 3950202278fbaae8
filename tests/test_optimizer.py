"""Grid optimizer vs the loop oracle + parabola fine-tune behavior."""

import numpy as np
import pytest

from videoquery.core.config import HyperParams, compute_eps
from videoquery.index.store import FeatureIndex, FeatureRecord
from videoquery.search.engine import SearchEngine
from videoquery.search.optimizer import optimize_weights, _parabola_vertex

from oracles import (
    make_sparse_problem,
    oracle_grid_losses,
    oracle_similarities,
)


def test_grid_losses_match_oracle(rng):
    streams, splits, clip_ids, target, candidates = make_sparse_problem(
        rng, p_missing=0.0
    )
    index_records = [
        FeatureRecord(c, s, k, "global_pool", np.asarray(v))
        for s in streams
        for k in splits
        for c, v in candidates[s][k].items()
    ]
    index = FeatureIndex.build(index_records, streams, splits, feature_dim=16)
    table = SearchEngine(index).compute_similarities(target)

    hp = HyperParams(ballast=0.2)
    # label half the clips at random
    reviewed = {int(c): float(rng.integers(0, 2)) for c in clip_ids[::2]}
    sims = oracle_similarities(target, candidates)
    want = oracle_grid_losses(
        sims, reviewed, hp.weight_grid, hp.threshold_grid, hp.ballast, hp.streams
    )

    new_hp, result = table.optimize(reviewed, hp)
    np.testing.assert_allclose(result.losses, want, rtol=5e-4, atol=5e-6)
    iw, it = np.unravel_index(np.argmin(want), want.shape)
    assert result.grid_index == (iw, it)
    assert new_hp.weights[streams[0]] == 1.0


def test_parabola_vertex_exact():
    # y = 3(x - 1.7)^2 + 2 through x = 1, 2, 3
    f = lambda x: 3 * (x - 1.7) ** 2 + 2
    v = _parabola_vertex(1.0, 2.0, 3.0, f(1.0), f(2.0), f(3.0))
    np.testing.assert_allclose(v, 1.7, rtol=1e-12)


def test_fine_tune_recovers_quadratic_minimum():
    """A perfectly separable quadratic loss surface should fine-tune to the
    analytic minimum, minus the COMPUTE_EPS threshold buffer."""
    hp = HyperParams()
    wg, tg = hp.weight_grid, hp.threshold_grid
    w_true, th_true = 1.234, 0.817
    W, T = np.meshgrid(wg, tg, indexing="ij")
    losses = 2.0 * (W - w_true) ** 2 + 3.0 * (T - th_true) ** 2

    # feed through the host-side fine-tune path directly
    from videoquery.search.optimizer import _quad_fine_tune

    iw, it = np.unravel_index(np.argmin(losses), losses.shape)
    w0, th0, ok = _quad_fine_tune(wg, tg, losses, int(iw), int(it))
    assert ok
    np.testing.assert_allclose(w0, w_true, atol=1e-9)
    np.testing.assert_allclose(th0, th_true, atol=1e-9)


def test_border_minimum_skips_fine_tune(rng):
    """If the grid minimum lands on the border, the raw grid point is used
    (reference hyperparameter.py:69-71)."""
    hp = HyperParams()
    # similarities driving all scores very low -> minimum at threshold border
    sim = np.full((2, 4), -2.0, np.float32)
    labels = np.asarray([1.0, 0.0, 1.0, 0.0])
    res = optimize_weights(
        sim, labels, hp.weight_grid, hp.threshold_grid, hp.ballast, compute_eps()
    )
    assert not res.fine_tuned
    iw, it = res.grid_index
    np.testing.assert_allclose(res.weight, hp.weight_grid[iw])
    np.testing.assert_allclose(res.threshold, hp.threshold_grid[it] - compute_eps())


def test_threshold_eps_buffer(rng):
    hp = HyperParams()
    sim = rng.uniform(0.5, 1.0, size=(2, 12)).astype(np.float32)
    labels = (sim.mean(axis=0) > 0.75).astype(np.float64)
    res = optimize_weights(
        sim, labels, hp.weight_grid, hp.threshold_grid, hp.ballast, compute_eps()
    )
    # threshold must carry the -eps round-off buffer
    grid_th = res.threshold + compute_eps()
    assert hp.threshold_grid[0] - 1e-9 <= grid_th <= hp.threshold_grid[-1] + 1e-9


def test_heaviside_zero_is_one():
    """H(0)=1: a label-0 clip whose score equals the threshold must be
    penalized as a false positive of zero magnitude but count via H."""
    from videoquery.search.optimizer import grid_losses
    import jax.numpy as jnp

    sim = jnp.asarray([[0.9], [0.9]], jnp.float32)
    labels = jnp.asarray([0.0], jnp.float32)
    wg = jnp.asarray([1.0], jnp.float32)
    # score at w=1: 1 - sqrt(2*(0.1)^2/2) = 0.9
    tg = jnp.asarray([0.9], jnp.float32)
    out = np.asarray(grid_losses(sim, labels, wg, tg, jnp.float32(0.0),
                                 jnp.ones(1, jnp.float32)))
    # H(0)-0 = 1 times (score-th)=0 -> loss = 0.5*0.9
    np.testing.assert_allclose(out[0, 0], 0.45, atol=1e-6)
