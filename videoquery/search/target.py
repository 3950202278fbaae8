"""Target estimation: scaling, least-squares bootstrapping, bagging.

Re-derivation of the reference's dynamic target adjustment
(target_clip.py:26-261; math summarized in SURVEY.md Appendix B). The solves
are tiny (n = handful of user-confirmed matches, D = 1024) so they run
host-side in float64 for exactness; the expensive part of a query round is
the similarity matmul, not these solves.

Internal layout: a target is ``{stream: {split: list[float]}}`` at the
service/JSON boundary (the bootstrapped_target contract of
ticket.py:286-299 / api_repository.py:65-78) and a dense
``f32[S, K, D] + bool[S, K]`` pair on device.
"""

from __future__ import annotations

import random
from typing import Mapping, Sequence

import numpy as np

FeatureDict = Mapping[str, Mapping[int, Sequence[float]]]


def scale_feature(f: np.ndarray) -> np.ndarray:
    """Squared-L2 scaling t = f / (f.f) so that t . f == 1; downstream dot
    products against the target are then cosine-like (reference
    target_clip.py:311-313, SURVEY.md Appendix B)."""
    f = np.asarray(f, np.float64)
    return f / np.dot(f, f)


def scaled_ref_features(ref_features: FeatureDict) -> dict[str, dict[int, list[float]]]:
    """Default (non-bootstrapped) target: the reference clip's features scaled
    per (stream, split) (reference target_clip.py:137-143)."""
    return {
        stream: {split: scale_feature(feat).tolist() for split, feat in splits.items()}
        for stream, splits in ref_features.items()
    }


def simple_bootstrap(valid: np.ndarray) -> np.ndarray:
    """Least-squares target from user-validated match features.

    valid: [n, D] rows of match features F. Solves for the w minimizing
    ||F w - 1||: with X = F^T,  w = X (X^T X)^{-1} 1  computed as
    X @ rowsum((X^T X)^{-1})  (reference target_clip.py:194-198)."""
    F = np.asarray(valid, np.float64)          # [n, D]
    G = F @ F.T                                # X^T X = F F^T, [n, n]
    mu = np.sum(np.linalg.inv(G), axis=1)      # [n]
    return F.T @ mu                            # [D]


def valid_plus_invalid_bootstrap(
    valid: np.ndarray, invalid: np.ndarray, mu: float
) -> np.ndarray:
    """Ridge-like solve using both user-validated matches X and invalid
    matches Y: push the target toward X.w = 1 while penalizing alignment with
    Y, with penalty strength mu scaled by tr(Y Y^T)
    (reference target_clip.py:248-260, SURVEY.md Appendix B):

        M = I + (mu / tr(Y Y^T)) Y^T Y
        w = M^{-1} X^T (X M^{-1} X^T)^{-1} 1
            + (M^{-1} - M^{-1} X^T (X M^{-1} X^T)^{-1} X M^{-1})
              * (mu / tr(Y Y^T)) Y^T 1
    """
    X = np.asarray(valid, np.float64)      # [nx, D]
    Y = np.asarray(invalid, np.float64)    # [ny, D]
    d = X.shape[1]
    scale = mu / np.trace(Y @ Y.T)
    m = np.eye(d) + scale * (Y.T @ Y)      # [D, D]
    m_inv = np.linalg.inv(m)
    b_inv = np.linalg.inv(X @ m_inv @ X.T)  # [nx, nx]
    w1 = m_inv @ X.T @ b_inv               # [D, nx]
    w2 = m_inv - w1 @ (X @ m_inv)          # [D, D]
    return np.sum(w2 @ (scale * Y.T), axis=1) + np.sum(w1, axis=1)


def random_fraction(
    items: list, fraction: float, replacement: bool, rng: random.Random | None = None
) -> list:
    """Random subsample of `items` (reference target_clip.py:297-309):
    round(n * fraction) draws, at least 1, with or without replacement;
    duplicates from replacement draws are collapsed. We iterate the dedup in
    sorted-index order for cross-platform determinism (the reference relies
    on CPython set-of-int ordering)."""
    if rng is None:
        rng = random
    n = len(items)
    k = max(round(n * fraction), 1)
    if replacement:
        draws = rng.choices(range(n), k=k)
    else:
        draws = rng.sample(range(n), k)
    return [items[i] for i in sorted(set(draws))]


class TargetEstimator:
    """Computes the target feature dict for a query round.

    Equivalent of the reference TargetClip minus the HTTP plumbing
    (target_clip.py:8-159): callers supply feature dicts, this class supplies
    the estimation policy (none / simple / partial_update / bagging).
    """

    def __init__(self, hyperparams, rng: random.Random | None = None):
        self.hp = hyperparams
        self.rng = rng

    def estimate(
        self,
        ref_features: FeatureDict,
        valid_match_features: list[FeatureDict],
        invalid_match_features: list[FeatureDict],
        splits: set[int],
        previous_target: FeatureDict | None,
        bootstrap: bool,
    ) -> dict[str, dict[int, list[float]]]:
        """Produce {stream: {split: [floats]}} (target_clip.py:26-73).

        No bootstrapping (or nothing to bootstrap from) falls back to the
        scaled reference-clip features."""
        if not bootstrap or previous_target is None or not valid_match_features:
            return scaled_ref_features(ref_features)
        kind = self.hp.bootstrap_type
        if kind == "simple":
            return self._adjust(valid_match_features, invalid_match_features,
                                splits, self.hp.f_bootstrap, replacement=False)
        if kind == "partial_update":
            new = self._adjust(valid_match_features, invalid_match_features,
                               splits, self.hp.f_bootstrap, replacement=False)
            return self._ema_with_previous(new, previous_target, splits)
        if kind == "bagging":
            bags = [
                self._adjust(valid_match_features, invalid_match_features,
                             splits, fraction=1.0, replacement=True)
                for _ in range(self.hp.nbags)
            ]
            return {
                stream: {
                    split: np.mean(
                        [bag[stream][split] for bag in bags], axis=0
                    ).tolist()
                    for split in splits
                }
                for stream in self.hp.streams
            }
        raise ValueError(f"unknown bootstrap_type {kind!r}")

    def _adjust(
        self,
        valid_dicts: list[FeatureDict],
        invalid_dicts: list[FeatureDict],
        splits: set[int],
        fraction: float,
        replacement: bool,
    ) -> dict[str, dict[int, list[float]]]:
        """One bootstrap draw over all (stream, split) cells
        (target_clip.py:84-103,161-261)."""
        valid_dicts = (
            random_fraction(valid_dicts, fraction, replacement, self.rng)
            if (fraction != 1.0 or replacement or invalid_dicts)
            else valid_dicts
        )
        if invalid_dicts:
            invalid_dicts = random_fraction(invalid_dicts, fraction, replacement, self.rng)
        target: dict[str, dict[int, list[float]]] = {}
        for stream in self.hp.streams:
            target[stream] = {}
            for split in splits:
                X = np.asarray([fd[stream][split] for fd in valid_dicts], np.float64)
                if invalid_dicts:
                    Y = np.asarray(
                        [fd[stream][split] for fd in invalid_dicts], np.float64
                    )
                    w = valid_plus_invalid_bootstrap(X, Y, self.hp.mu)
                else:
                    w = simple_bootstrap(X)
                target[stream][split] = w.tolist()
        return target

    def _ema_with_previous(
        self, new: dict, previous: FeatureDict, splits: set[int]
    ) -> dict[str, dict[int, list[float]]]:
        """partial_update: f_memory * new + (1 - f_memory) * old
        (target_clip.py:75-82)."""
        if not previous:
            return new
        fm = self.hp.f_memory
        return {
            stream: {
                split: (
                    fm * np.asarray(new[stream][split], np.float64)
                    + (1.0 - fm) * np.asarray(previous[stream][split], np.float64)
                ).tolist()
                for split in splits
            }
            for stream in self.hp.streams
        }
