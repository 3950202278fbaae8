"""Pure-numpy float64 oracles mirroring the reference's dict-and-loop
semantics (ticket.py, hyperparameter.py), written fresh from SURVEY.md
Appendix B. The framework's batched implementations are validated against
these on randomized sparse inputs."""

from __future__ import annotations

import numpy as np


def oracle_similarities(target: dict, candidates: dict) -> dict:
    """Reference ticket.compute_similarities semantics (ticket.py:120-163).

    target: {stream: {split: vec}}; candidates: {stream: {split: {clip: vec}}}
    Returns {clip: {stream: [avg_sim, n]}}.
    """
    avgd: dict = {}
    for stream, splits in target.items():
        sims: dict = {}
        for split, tvec in splits.items():
            for clip, cvec in candidates[stream][split].items():
                sims.setdefault(clip, []).append(float(np.dot(tvec, cvec)))
        for clip, arr in sims.items():
            avgd.setdefault(clip, {})[stream] = [sum(arr) / len(arr), len(arr)]
    return avgd


def oracle_scores(similarities: dict, weights: dict) -> dict:
    """Reference ticket.compute_scores (ticket.py:165-180)."""
    scores = {}
    for clip, vsim in similarities.items():
        ssum, denom = 0.0, 0.0
        for stream, w in weights.items():
            ssum += (w * (1.0 - vsim[stream][0])) ** 2
            denom += w ** 2
        scores[clip] = 1.0 - np.sqrt(ssum / denom)
    return scores


def oracle_grid_losses(
    similarities: dict,
    match_status: dict,
    weight_grid: np.ndarray,
    threshold_grid: np.ndarray,
    ballast: float,
    streams: tuple,
) -> np.ndarray:
    """Reference optimize_weights loss grid (hyperparameter.py:52-65)."""
    losses = 100.0 * np.ones((len(weight_grid), len(threshold_grid)))
    for iw, w in enumerate(weight_grid):
        scores = oracle_scores(similarities, {streams[0]: 1.0, streams[1]: w})
        for it, th in enumerate(threshold_grid):
            loss = 0.5 * th
            for clip, label in match_status.items():
                s = scores[clip]
                loss += (np.heaviside(s - th, 1) - label) * (s - th) * (
                    1 + label * ballast
                )
            losses[iw, it] = loss / len(match_status)
    return losses


def oracle_simple_bootstrap(valid_rows: np.ndarray) -> np.ndarray:
    """Reference _bootstrap_valid_matches math (target_clip.py:194-198)."""
    X = np.asarray(valid_rows, np.float64).T  # [D, n]
    m_inv = np.linalg.inv(X.T @ X)
    mu = np.sum(m_inv, axis=1).reshape(-1, 1)
    return (X @ mu).ravel()


def oracle_valid_plus_invalid(X: np.ndarray, Y: np.ndarray, mu: float) -> np.ndarray:
    """Reference _bootstrap_valid_plus_invalid math (target_clip.py:248-260)."""
    X = np.asarray(X, np.float64)
    Y = np.asarray(Y, np.float64)
    scale = mu / np.trace(Y @ Y.T)
    M = np.eye(Y.shape[1]) + scale * (Y.T @ Y)
    M_inv = np.linalg.inv(M)
    B_inv = np.linalg.inv(X @ M_inv @ X.T)
    w1 = M_inv @ X.T @ B_inv
    w2 = M_inv - w1 @ X @ M_inv
    w3 = np.sum(w2 @ (scale * Y.T), axis=1)
    return w3 + np.sum(w1, axis=1)


def make_sparse_problem(rng, n_streams=2, n_splits=3, n_clips=40, dim=16,
                        p_missing=0.25):
    """Random candidates/target with missing (stream, split, clip) cells.
    Clip ids are non-contiguous to exercise id mapping."""
    streams = ["rgb", "warped_optical_flow"][:n_streams]
    splits = list(range(1, n_splits + 1))
    clip_ids = sorted(rng.choice(10_000, size=n_clips, replace=False).tolist())
    target = {
        s: {k: rng.normal(size=dim) * 0.05 for k in splits} for s in streams
    }
    candidates: dict = {s: {k: {} for k in splits} for s in streams}
    for s in streams:
        for k in splits:
            for c in clip_ids:
                if rng.random() > p_missing:
                    candidates[s][k][c] = rng.normal(size=dim)
    return streams, splits, clip_ids, target, candidates
