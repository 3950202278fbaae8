"""SearchEngine: the device-side query round.

Glues the FeatureIndex to the scoring/optimizer math. One query round on the
reference is thousands of Python-level np.dot calls plus a 1200-evaluation
grid loop (ticket.py:120-180, hyperparameter.py:52-76); here it is two jitted
XLA programs (similarity einsum; loss-grid) regardless of search-set size,
sharded over the "data" mesh axis when the index is.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from videoquery.core.config import HyperParams, compute_eps
from videoquery.index.store import FeatureIndex
from videoquery.search.optimizer import GridResult, optimize_weights
from videoquery.search.scoring import ensemble_similarities


_PACK_F32_JIT = None

# Ensemble counts are tiny (<= n_splits, i.e. <= 3 for the reference's
# UCF101 ensemble), so all streams' counts pack losslessly into ONE f32 row
# of base-8 digits — the similarity download shrinks from [2S, N] to
# [S+1, N] (25% less over the tunnel at S=2; 4 MB/round at 1M segments).
_COUNT_RADIX = 8


def _pack_f32(avg, counts):
    """Stack (avg f32[S,N], counts i32[S,N]) into one f32[S+1,N] so the
    round's result leaves the device in a single transfer. Row S holds the
    per-stream counts as base-8 digits (exact: S*3 bits << f32's 24-bit
    integer range).

    The jitted pack is created once at first use (module-level cache):
    jit caches by callable identity, so a per-call lambda would re-trace
    every round."""
    global _PACK_F32_JIT
    if _PACK_F32_JIT is None:
        import jax
        import jax.numpy as jnp

        def pack(a, c):
            s = c.shape[0]
            scale = _COUNT_RADIX ** jnp.arange(s, dtype=jnp.int32)
            digits = jnp.sum(c * scale[:, None], axis=0).astype(jnp.float32)
            return jnp.concatenate([a, digits[None]], axis=0)

        _PACK_F32_JIT = jax.jit(pack)
    return _PACK_F32_JIT(avg, counts)


def _unpack_counts(digits: np.ndarray, s: int) -> np.ndarray:
    """Invert _pack_f32's count row: f32[N] -> i32[S, N]."""
    d = np.rint(digits).astype(np.int64)
    return np.stack(
        [(d // _COUNT_RADIX ** si) % _COUNT_RADIX for si in range(s)]
    ).astype(np.int32)


class SimilarityTable:
    """Host-side view of the device similarity computation for one target."""

    def __init__(self, index: FeatureIndex, avg_sim: np.ndarray, counts: np.ndarray):
        self.index = index
        self.avg_sim = avg_sim  # f32[S, Npad]
        self.counts = counts    # i32[S, Npad]

    def valid_positions(self) -> np.ndarray:
        n = self.index.n_clips
        return np.flatnonzero((self.counts[:, :n] > 0).all(axis=0))

    def similarities_dict(self) -> dict[int, dict[str, list]]:
        """The reference's similarity structure
        {clip: {stream: [avg_sim, n_ensemble]}} (ticket.py:124), in canonical
        ascending-clip-id order, for API/report compatibility."""
        out: dict[int, dict[str, list]] = {}
        n = self.index.n_clips
        for pos in range(n):
            entry = {}
            for si, stream in enumerate(self.index.streams):
                c = int(self.counts[si, pos])
                if c > 0:
                    entry[stream] = [float(self.avg_sim[si, pos]), c]
            if entry:
                out[int(self.index.clip_ids[pos])] = entry
        return out

    def scores(self, weights: Mapping[str, float]) -> dict[int, float]:
        """{clip_id: score} for every clip with all streams present, ascending
        clip id (ticket.py:165-180 + the determinism contract).

        The elementwise score is computed host-side in float64 (the
        similarities are already materialized here); the device-fused
        score path for huge corpora lives in scoring.weighted_scores."""
        n = self.index.n_clips
        w = np.asarray([weights[s] for s in self.index.streams], np.float64)
        avg = self.avg_sim[:, :n].astype(np.float64)
        valid = (self.counts[:, :n] > 0).all(axis=0)
        dev = w[:, None] * (1.0 - avg)
        sc = 1.0 - np.sqrt((dev * dev).sum(axis=0) / (w * w).sum())
        # dict(zip(...tolist())) builds the same ascending-clip-id dict ~6x
        # faster than a per-element Python loop (measured 96 -> 15 ms at
        # 100k clips — it was a visible slice of the revise round)
        ids = np.asarray(self.index.clip_ids[:n])[valid]
        return dict(zip(ids.tolist(), sc[valid].tolist()))

    def optimize(
        self, reviewed_labels: Mapping[int, float], hp: HyperParams
    ) -> tuple[HyperParams, GridResult]:
        """Grid + parabolic optimization over the reviewed clips
        (hyperparameter.py:29-76). reviewed_labels: {clip_id: 0/1}.

        Returns hyperparams updated with the new round state."""
        positions, labels = [], []
        for clip_id, label in reviewed_labels.items():
            pos = self.index.position(clip_id)
            if pos is None:
                raise KeyError(f"reviewed clip {clip_id} not in the search set")
            positions.append(pos)
            labels.append(float(label))
        sim = self.avg_sim[:, np.asarray(positions, np.int64)]
        result = optimize_weights(
            sim,
            np.asarray(labels, np.float64),
            hp.weight_grid,
            hp.threshold_grid,
            hp.ballast,
            compute_eps(),
            exact=sim.dtype == np.float64,
        )
        new_weights = {hp.streams[0]: 1.0, hp.streams[1]: result.weight}
        return hp.with_round_state(new_weights, result.threshold), result


class SearchEngine:
    """Two numerics modes:

    - default: float32 on device (TPU MXU) with HIGHEST matmul precision —
      the performance path.
    - exact=True: float64 on host BLAS — bit-comparable to the reference's
      numpy math for parity validation and small corpora. Requires the index
      to have been built with keep_host=True.
    """

    def __init__(self, index: FeatureIndex, exact: bool = False):
        self.index = index
        self.exact = exact
        if exact and index.host_feats is None:
            raise ValueError("exact mode needs FeatureIndex.build(keep_host=True)")

    def compute_similarities(
        self, target: Mapping[str, Mapping[int, list]]
    ) -> SimilarityTable:
        if self.exact:
            return self._compute_similarities_host(target)
        targets, tmask = self.index.target_arrays(target)
        avg, counts = ensemble_similarities(
            targets, tmask, self.index.feats, self.index.mask
        )
        # ONE download: counts are tiny ints (<= n_splits), packed exactly
        # into one extra f32 row; a second device->host transfer costs
        # ~25 ms-1 s latency tunneled
        s = avg.shape[0]
        if len(self.index.splits) < _COUNT_RADIX and 3 * s <= 24:
            packed = np.asarray(_pack_f32(avg, counts))
            return SimilarityTable(self.index, packed[:s],
                                   _unpack_counts(packed[s], s))
        # ensembles too wide for digit packing (never the reference shape)
        return SimilarityTable(self.index, np.asarray(avg),
                               np.asarray(counts))

    def _compute_similarities_host(self, target) -> SimilarityTable:
        targets, tmask = self.index.target_arrays_host(target)
        feats, mask = self.index.host_feats, self.index.host_mask
        s, k, n, _ = feats.shape
        sims = np.empty((s, k, n), np.float64)
        for si in range(s):
            for ki in range(k):
                sims[si, ki] = feats[si, ki] @ targets[si, ki]
        m = mask & tmask[:, :, None]
        counts = m.sum(axis=1).astype(np.int32)
        avg = np.where(m, sims, 0.0).sum(axis=1) / np.maximum(counts, 1)
        return SimilarityTable(self.index, avg, counts)
