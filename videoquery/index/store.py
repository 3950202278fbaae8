"""Sharded embedding index.

The reference keeps candidate features as nested Python dicts fetched from
the API per query (ticket.py:358-382). Here the search set is a dense
device-resident index:

    feats f32[S, K, N, D]  +  mask bool[S, K, N]  +  clip_ids i64[N]

with the clip axis padded to a tile-friendly multiple and shardable over the
"data" mesh axis, so a 1M-segment corpus is one (distributed) array and a
query round is one XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from videoquery.core.meshes import pad_to_multiple


@dataclasses.dataclass(frozen=True)
class FeatureRecord:
    """One embedding row, mirroring the API 'features' resource fields
    consumed by the reference (ticket.py:374-381)."""

    clip_id: int
    stream: str
    split: int
    name: str
    vector: np.ndarray


class FeatureIndex:
    """Dense (stream, split, clip) -> embedding index.

    Canonical clip order is ascending clip id (the framework-wide determinism
    contract, SURVEY.md §7). `n_clips` is the real clip count; the arrays are
    padded to `pad_multiple` with mask=False rows that can never match.
    """

    def __init__(
        self,
        clip_ids: np.ndarray,      # i64[N] ascending, real clips only
        feats: jax.Array,          # f32[S, K, Npad, D]
        mask: jax.Array,           # bool[S, K, Npad]
        streams: tuple[str, ...],
        splits: tuple[int, ...],
        feature_name: str,
    ):
        self.clip_ids = clip_ids
        self.feats = feats
        self.mask = mask
        self.streams = streams
        self.splits = splits
        self.feature_name = feature_name
        self._id_to_pos = {int(c): i for i, c in enumerate(clip_ids)}
        # Optional host-side float64 copies for the exact (reference-parity)
        # similarity path; populated by build(keep_host=True).
        self.host_feats: np.ndarray | None = None
        self.host_mask: np.ndarray | None = None

    # -- construction -------------------------------------------------------

    @staticmethod
    def build(
        records: Iterable[FeatureRecord],
        streams: Sequence[str],
        splits: Sequence[int] | None = None,
        feature_name: str = "global_pool",
        feature_dim: int | None = None,
        pad_multiple: int = 8,
        dtype=jnp.float32,
        device_put: bool = True,
        sharding=None,
        keep_host: bool = False,
    ) -> "FeatureIndex":
        recs = [
            r for r in records
            if r.stream in streams and r.name == feature_name
            and (splits is None or r.split in splits)
        ]
        if not recs:
            raise ValueError("no matching feature records")
        if splits is None:
            splits = sorted({r.split for r in recs})
        splits = tuple(int(s) for s in splits)
        streams = tuple(streams)
        clip_ids = np.asarray(sorted({r.clip_id for r in recs}), np.int64)
        dim = feature_dim or len(recs[0].vector)
        n = len(clip_ids)
        n_pad = pad_to_multiple(max(n, 1), pad_multiple)
        feats = np.zeros((len(streams), len(splits), n_pad, dim), np.float64)
        mask = np.zeros((len(streams), len(splits), n_pad), bool)
        pos = {int(c): i for i, c in enumerate(clip_ids)}
        s_idx = {s: i for i, s in enumerate(streams)}
        k_idx = {k: i for i, k in enumerate(splits)}
        for r in recs:
            v = np.asarray(r.vector, np.float64)
            if v.shape[0] != dim:
                raise ValueError(
                    f"feature for clip {r.clip_id} has dim {v.shape[0]}, expected {dim}"
                )
            feats[s_idx[r.stream], k_idx[r.split], pos[r.clip_id]] = v
            mask[s_idx[r.stream], k_idx[r.split], pos[r.clip_id]] = True
        feats_j = jnp.asarray(feats, dtype)  # cast once from the f64 staging buffer
        mask_j = jnp.asarray(mask)
        if device_put and sharding is not None:
            feats_j = jax.device_put(feats_j, sharding)
            mask_j = jax.device_put(mask_j, sharding)
        index = FeatureIndex(clip_ids, feats_j, mask_j, streams, splits, feature_name)
        if keep_host:
            index.host_feats = feats
            index.host_mask = mask
        return index

    @staticmethod
    def from_feature_dicts(
        per_clip: Mapping[int, Mapping[str, Mapping[int, Sequence[float]]]],
        streams: Sequence[str],
        feature_name: str = "global_pool",
        **kwargs,
    ) -> "FeatureIndex":
        """Build from {clip_id: {stream: {split: vector}}} (the shape the
        service layer assembles from API responses)."""
        records = [
            FeatureRecord(cid, stream, split, feature_name, np.asarray(vec))
            for cid, sd in per_clip.items()
            for stream, kd in sd.items()
            for split, vec in kd.items()
        ]
        return FeatureIndex.build(records, streams, feature_name=feature_name, **kwargs)

    # -- queries -------------------------------------------------------------

    @property
    def n_clips(self) -> int:
        return len(self.clip_ids)

    @property
    def n_padded(self) -> int:
        return self.feats.shape[2]

    @property
    def feature_dim(self) -> int:
        return self.feats.shape[3]

    def position(self, clip_id: int) -> int | None:
        return self._id_to_pos.get(int(clip_id))

    def target_arrays(
        self, target: Mapping[str, Mapping[int, Sequence[float]]]
    ) -> tuple[jax.Array, jax.Array]:
        """Pack a {stream: {split: vector}} target dict into the dense
        (targets f32[S, K, D], target_mask bool[S, K]) layout."""
        t = np.zeros((len(self.streams), len(self.splits), self.feature_dim), np.float32)
        m = np.zeros((len(self.streams), len(self.splits)), bool)
        for si, stream in enumerate(self.streams):
            for ki, split in enumerate(self.splits):
                vec = target.get(stream, {}).get(split)
                if vec is None:  # JSON round-trips may stringify split keys
                    vec = target.get(stream, {}).get(str(split))
                if vec is not None:
                    t[si, ki] = np.asarray(vec, np.float32)
                    m[si, ki] = True
        return jnp.asarray(t), jnp.asarray(m)

    def target_arrays_host(
        self, target: Mapping[str, Mapping[int, Sequence[float]]]
    ) -> tuple[np.ndarray, np.ndarray]:
        """Float64 host-side variant of target_arrays for the exact
        (reference-parity) similarity path."""
        t = np.zeros((len(self.streams), len(self.splits), self.feature_dim), np.float64)
        m = np.zeros((len(self.streams), len(self.splits)), bool)
        for si, stream in enumerate(self.streams):
            for ki, split in enumerate(self.splits):
                vec = target.get(stream, {}).get(split)
                if vec is None:
                    vec = target.get(stream, {}).get(str(split))
                if vec is not None:
                    t[si, ki] = np.asarray(vec, np.float64)
                    m[si, ki] = True
        return t, m

    def shard(self, feats_sharding, mask_sharding=None) -> "FeatureIndex":
        """Re-place the index arrays with the given shardings. feats is rank
        4 [S, K, N, D]; mask is rank 3 [S, K, N] — if mask_sharding is not
        given, it is derived by dropping the last axis of the feats spec."""
        if mask_sharding is None:
            from jax.sharding import NamedSharding, PartitionSpec

            spec = feats_sharding.spec
            mask_sharding = NamedSharding(
                feats_sharding.mesh, PartitionSpec(*spec[:3])
            )
        from videoquery.core.transfer import put_global

        return FeatureIndex(
            self.clip_ids,
            put_global(self.feats, feats_sharding),
            put_global(self.mask, mask_sharding),
            self.streams,
            self.splits,
            self.feature_name,
        )
