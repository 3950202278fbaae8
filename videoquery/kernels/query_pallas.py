"""Pallas fused multi-query scoring kernel.

The XLA query path materializes the [Q, S, K, N] similarity tensor
(Q=16, N=1M -> 384 MB of f32 HBM intermediates) before the masked ensemble
reductions and the score transform. This kernel streams the index ONE tile
at a time: per (tile, stream, split) grid step it does a [Q, D] x [D, T]
MXU matmul, accumulates per-stream masked sums/counts in VMEM scratch, and
on the last ensemble member emits the final weighted scores for the tile —
the index is read exactly once and nothing else touches HBM.

score = 1 - sqrt( sum_s (w_qs (1 - avg_qs))^2 / sum_s w_qs^2 )
(reference ticket.py:165-180), invalid clips (missing a stream) -> -inf.

Top-k over the resulting [Q, N] scores stays in XLA (one cheap pass).

Layout notes: Pallas blocks must have their last two dims (8, 128)-aligned
or span the full array dim, so the small operands are reshaped — targets to
[S*K, Q, D] (one ensemble member per grid step), masks to 2-D with
full-span blocks and the ensemble row selected by one-hot inside the kernel
(dynamic row indexing into VMEM values is not lowerable).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # scores live in [-1, 1]; avoids inf arithmetic on the VPU


def _query_kernel(feats_ref, mask_ref, targets_ref, tmask_ref, weights_ref,
                  out_ref, acc_ref, cnt_ref, *, n_streams: int, n_splits: int):
    s = pl.program_id(1)
    k = pl.program_id(2)
    sk = s * n_splits + k

    @pl.when((s == 0) & (k == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    # [Q, D] x [T, D]^T -> [Q, T] on the MXU, f32 accumulation
    t = targets_ref[0]                                         # [Q, D]
    f = feats_ref[0, 0]                                        # [T, D]
    sims = jax.lax.dot_general(
        t.astype(f.dtype), f,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # exact f32 products (bf16
    )                                         # inputs are exact either way)
    # select ensemble row sk from the full-span mask blocks via one-hot
    n_members = n_streams * n_splits
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_members, 1), 0)
    onehot = (rows == sk).astype(jnp.float32)                  # [SK, 1]
    mrow = jnp.sum(mask_ref[...].astype(jnp.float32) * onehot, axis=0)  # [T]
    trow = jnp.sum(
        tmask_ref[...].astype(jnp.float32) * onehot.reshape(1, n_members),
        axis=1,
    )                                                          # [Q]
    m = mrow[None, :] * trow[:, None]                          # [Q, T] 0/1

    # accumulate into the per-stream scratch; stream index must be static
    # (dynamic leading-dim stores lower as unsupported gathers)
    masked = jnp.where(m > 0, sims, 0.0)
    for si in range(n_streams):
        @pl.when(s == si)
        def _acc(si=si):
            acc_ref[si] += masked
            cnt_ref[si] += m

    @pl.when((s == n_streams - 1) & (k == n_splits - 1))
    def _finish():
        w = weights_ref[...]                                    # [Q, S]
        den = jnp.sum(w * w, axis=1)[:, None]                   # [Q, 1]
        num = jnp.zeros_like(acc_ref[0])
        valid = jnp.ones_like(acc_ref[0], dtype=jnp.bool_)
        for si in range(n_streams):                             # S static (=2)
            cnt = cnt_ref[si]
            avg = acc_ref[si] / jnp.maximum(cnt, 1.0)
            dev = w[:, si][:, None] * (1.0 - avg)
            num += dev * dev
            valid &= cnt > 0
        score = 1.0 - jnp.sqrt(num / den)
        out_ref[...] = jnp.where(valid, score, NEG_INF)


@functools.partial(jax.jit, static_argnames=("tile",))
def fused_query_scores(
    feats: jax.Array,    # [S, K, N, D] (bf16 or f32), N % tile == 0
    mask: jax.Array,     # bool [S, K, N]
    targets: jax.Array,  # f32 [Q, S, K, D]
    tmask: jax.Array,    # bool [Q, S, K]
    weights: jax.Array,  # f32 [Q, S]
    tile: int = 2048,
) -> jax.Array:
    """All-pairs weighted scores f32[Q, N] in one streaming pass."""
    s, k, n, d = feats.shape
    q = targets.shape[0]
    if n % tile != 0:
        raise ValueError(f"N={n} must be a multiple of tile={tile}")
    targets_r = targets.transpose(1, 2, 0, 3).reshape(s * k, q, d)
    mask_r = mask.reshape(s * k, n)
    tmask_r = tmask.reshape(q, s * k)
    grid = (n // tile, s, k)
    out = pl.pallas_call(
        functools.partial(_query_kernel, n_streams=s, n_splits=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, tile, d), lambda i, si, ki: (si, ki, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s * k, tile), lambda i, si, ki: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, d), lambda i, si, ki, _k=k: (si * _k + ki, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, s * k), lambda i, si, ki: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, s), lambda i, si, ki: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((q, tile), lambda i, si, ki: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q, n), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((s, q, tile), jnp.float32),  # per-stream masked sums
            pltpu.VMEM((s, q, tile), jnp.float32),  # per-stream counts
        ],
    )(feats, mask_r, targets_r, tmask_r, weights)
    return out


@functools.partial(jax.jit, static_argnames=("k", "tile"))
def fused_query_topk(feats, mask, targets, tmask, weights, k: int = 20,
                     tile: int = 2048):
    """Fused scores + XLA top-k: (vals f32[Q, k], idx i32[Q, k])."""
    scores = fused_query_scores(feats, mask, targets, tmask, weights, tile)
    return jax.lax.top_k(scores, k)
