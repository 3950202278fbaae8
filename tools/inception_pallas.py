"""Fused BN-Inception block as one Pallas TPU kernel.

Why: on the bench chip the ensemble forward is HBM-bandwidth-bound, not
FLOPs-bound (conv throughput doubles once the activation write is excluded;
see docs/TUNING.md). XLA executes an inception block as ~7 convs + a pool +
a concat, reading the block input 4 times and materializing every branch.
This kernel keeps ONE image-group tile of the input in VMEM and computes
all four branches with MXU dot_generals (1x1 convs as plain matmuls, 3x3
convs as 9 shifted-tap matmuls), writing only the concatenated output —
one HBM read + one write per block.

Covers the 8 stride-1 blocks (3a, 3b, 4a-4d, 5a, 5b — reference prototxt
inception definitions, rgb deploy :47-739). The 2 stride-2 reduction
blocks (3c, 4e) stay on the XLA path: they are 2 of 10 and their strided
convs/pools reshape the tile geometry.

STATUS: demoted out of the production package (the `fused_blocks` hook it
used to hang off bn_inception.apply was removed along with the demotion;
to benchmark it, call fused_inception_block directly or run
tools/inception_block_bench.py), MEASURED SLOWER than XLA on this stack (round-3 second pass,
tools/inception_block_bench.py, production ensemble geometry: vmap x3
members, 200 bf16 images): inception_4b (14x14) runs 9.77 ms fused vs
5.99 ms unfused — the 9-tap rank-4 dot chains at unaligned spatial sizes
lower badly — and the 28x28 block (3b) OOM-kills the Mosaic compile
helper outright (~80 MB MLIR). An earlier justification ("the unfused
forward is at 93-100% MFU, nothing to win") rested on an RTT-polluted
peak measurement and is withdrawn; the corrected account
(docs/TUNING.md) shows the forward inside its conv-SHAPE matmul envelope
(narrow-cout/small-K layers cap at 27-86 TF/s on this 161-176 TF/s
part), with the remaining gap to the traffic bound owned by XLA's conv
scheduling — which this kernel, as measured, does not beat. Kept as the
reference implementation of the fusion idea and for future Mosaic stacks;
re-run the A/B tool before ever turning it on.

Correctness notes:
- Caffe AVE pool (zero padding, constant 9 denominator) falls out of the
  zero-padded input tile for free; MAX pool with zero padding equals the
  -inf-padded reference because every block input is a concat of ReLU
  outputs and pools of ReLU outputs (>= 0).
- All accumulation in f32 (preferred_element_type), activations bf16/f32
  matching the caller's dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _mm(a, w, b, relu=True):
    """relu(a @ w + b) contracting a's LAST dim, f32 accumulation."""
    y = jax.lax.dot_general(a, w, (((a.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(a.dtype)


def _block_kernel(xp_ref, *refs, g: int, h: int, w: int, cin: int,
                  has_c1: bool, pool_kind: str, has_pp: bool):
    """One fused stride-1 inception block for a group of g images.

    xp_ref: (g, h+2, w+2, cin) spatially zero-padded input tile.
    refs: weight/bias refs in fixed order, then the output ref (g, h, w, cout).
    """
    names = []
    if has_c1:
        names += ["c1_w", "c1_b"]
    names += ["r3_w", "r3_b", "c3_w", "c3_b", "rd_w", "rd_b",
              "d1_w", "d1_b", "d2_w", "d2_b"]
    if has_pp:
        names += ["pp_w", "pp_b"]
    wr = dict(zip(names, refs[:-1]))
    o_ref = refs[-1]

    xp = xp_ref[...]
    # Everything stays rank-4 (g, h, w, c): Mosaic's shape-cast rules cannot
    # merge unaligned spatial dims into a matmul M dim, but rank-4
    # dot_general contracting the channel dim lowers fine.
    xc = xp[:, 1:h + 1, 1:w + 1, :]

    def conv3(src_padded, w_taps, bias):
        """3x3 conv on a (g, h+2, w+2, c) zero-padded tile via 9 shifted-tap
        matmuls; returns relu(<conv>) (g, h, w, cout)."""
        acc = None
        for dy in range(3):
            for dx in range(3):
                a = src_padded[:, dy:dy + h, dx:dx + w, :]
                y = jax.lax.dot_general(
                    a, w_taps[dy, dx], (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
        return jnp.maximum(acc + bias, 0.0).astype(src_padded.dtype)

    def pad_spatial(t):
        return jnp.pad(t, ((0, 0), (1, 1), (1, 1), (0, 0)))

    outs = []
    if has_c1:
        outs.append(_mm(xc, wr["c1_w"][...], wr["c1_b"][...]))
    r3 = _mm(xc, wr["r3_w"][...], wr["r3_b"][...])
    outs.append(conv3(pad_spatial(r3), wr["c3_w"][...], wr["c3_b"][...]))
    rd = _mm(xc, wr["rd_w"][...], wr["rd_b"][...])
    d1 = conv3(pad_spatial(rd), wr["d1_w"][...], wr["d1_b"][...])
    outs.append(conv3(pad_spatial(d1), wr["d2_w"][...], wr["d2_b"][...]))

    # pool branch: 9 shifted adds (AVE, /9 with zeros counted — caffe
    # semantics) or maxes (zero pad == -inf pad since inputs >= 0)
    pool = None
    for dy in range(3):
        for dx in range(3):
            s = xp[:, dy:dy + h, dx:dx + w, :]
            if pool is None:
                pool = s if pool_kind == "max" else s.astype(jnp.float32)
            elif pool_kind == "max":
                pool = jnp.maximum(pool, s)
            else:
                pool = pool + s.astype(jnp.float32)
    if pool_kind == "ave":
        pool = (pool / 9.0).astype(xp.dtype)
    if has_pp:
        outs.append(_mm(pool, wr["pp_w"][...], wr["pp_b"][...]))
    else:
        outs.append(pool)

    o_ref[...] = jnp.concatenate(outs, axis=-1)


def fused_inception(params, name: str, spec: dict, x: jax.Array,
                    group: int = 8) -> jax.Array:
    """Run one stride-1 inception block fused. x: [N, H, W, C]; returns
    [N, H, W, Cout]. Falls back is the caller's job (stride-2 blocks)."""
    assert spec["stride"] == 1
    n, h, w, cin = x.shape
    has_c1 = bool(spec["c1"])
    has_pp = bool(spec["pp"])
    cout = (spec["c1"] + spec["c3"] + spec["d2"]
            + (spec["pp"] if has_pp else cin))

    def wb(layer):
        p = params[f"{name}/{layer}"]
        wt = p["w"].astype(x.dtype)
        # biases as (1, c): 1-D operands violate Pallas' (8, 128) block
        # tiling once vmap over stacked ensemble params adds a batch dim
        return wt, p["b"].astype(jnp.float32).reshape(1, -1)

    weights = []
    if has_c1:
        w1, b1 = wb("1x1")
        weights += [w1.reshape(cin, -1), b1]
    wr3, br3 = wb("3x3_reduce")
    w3, b3 = wb("3x3")
    wrd, brd = wb("double_3x3_reduce")
    wd1, bd1 = wb("double_3x3_1")
    wd2, bd2 = wb("double_3x3_2")
    weights += [wr3.reshape(cin, -1), br3, w3, b3,
                wrd.reshape(cin, -1), brd, wd1, bd1, wd2, bd2]
    if has_pp:
        wpp, bpp = wb("pool_proj")
        weights += [wpp.reshape(cin, -1), bpp]

    g = group
    n_pad = -(-n // g) * g
    xp = jnp.pad(x, ((0, n_pad - n), (1, 1), (1, 1), (0, 0)))

    in_specs = [pl.BlockSpec((g, h + 2, w + 2, cin), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(w_.shape, lambda i, nd=w_.ndim: (0,) * nd,
                              memory_space=pltpu.VMEM) for w_ in weights]
    out = pl.pallas_call(
        functools.partial(
            _block_kernel, g=g, h=h, w=w, cin=cin,
            has_c1=has_c1, pool_kind=spec["pool"], has_pp=has_pp),
        grid=(n_pad // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, h, w, cout), x.dtype),
        compiler_params=_VMEM,
    )(xp, *weights)
    return out[:n]
