"""Pallas TPU kernel for TV-L1 optical flow.

Why: the XLA path (kernels/tvl1.py) is bound by two TPU pathologies measured
on the chip — arbitrary gathers run at ~50 ns/index (the bilinear warp), and
the ~20 elementwise passes per primal-dual iteration each round-trip HBM.
This kernel runs an ENTIRE pyramid level for one frame pair inside VMEM:
one HBM read of (I0, I1, u, v), n_warps x n_iters of updates on-chip, one
HBM write of (u, v).

Gather-free warping: bilinear sampling at (x+u, y+v) is decomposed into a
window of integer shifts with per-pixel bilinear weights
w(dy,dx) = max(0, 1-|v-dy|) * max(0, 1-|u-dx|) — exact bilinear
interpolation for |flow| <= D, flow clamped to the window (the reference
pipeline clamps flow to ±20 px at quantization anyway,
build_wof_clips.py:70-73). The window is a fori_loop over offsets whose
body takes ONE dynamic VMEM slice of an edge-prepadded I1 — unrolling the
window statically overwhelms the Mosaic register allocator beyond ~36
terms. In the default production mode (grad_source="warped") only I1
moves through the window loops and its gradients come from differentiating
the warped image; the classical mode warps I1 and its two gradient images
together, sharing the weight computation.

Semantics match kernels/tvl1._tvl1_level (same update equations); the pure
JAX path remains the portable reference implementation and the test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videoquery.kernels.tvl1 import TVL1Params


def _forward_diff(f):
    """Forward differences on the last two axes (works for [H, W] and
    [G, H, W] blocks)."""
    zx = jnp.zeros(f.shape[:-1] + (1,), f.dtype)
    zy = jnp.zeros(f.shape[:-2] + (1,) + f.shape[-1:], f.dtype)
    fx = jnp.concatenate([f[..., :, 1:] - f[..., :, :-1], zx], axis=-1)
    fy = jnp.concatenate([f[..., 1:, :] - f[..., :-1, :], zy], axis=-2)
    return fx, fy


def _divergence(p1, p2):
    d1 = jnp.concatenate(
        [p1[..., :, :1], p1[..., :, 1:-1] - p1[..., :, :-2],
         -p1[..., :, -2:-1]], axis=-1)
    d2 = jnp.concatenate(
        [p2[..., :1, :], p2[..., 1:-1, :] - p2[..., :-2, :],
         -p2[..., -2:-1, :]], axis=-2)
    return d1 + d2


def _level_kernel(*refs, p: TVL1Params, d: int):
    """One whole pyramid level in VMEM. i1p (and, in grad_source="image"
    mode, i1xp/i1yp) are edge-padded by P = d+1 (top/left) and at least P
    (bottom/right) on the spatial dims."""
    grad_warped = p.grad_source == "warped" and p.separable_warp
    if grad_warped:
        i0_ref, i1p_ref, u_ref, v_ref, uo_ref, vo_ref = refs
        i1xp = i1yp = None
    else:
        (i0_ref, i1p_ref, i1xp_ref, i1yp_ref, u_ref, v_ref,
         uo_ref, vo_ref) = refs
        i1xp = i1xp_ref[...]
        i1yp = i1yp_ref[...]
    i0 = i0_ref[...]
    u = u_ref[...]
    v = v_ref[...]
    i1p = i1p_ref[...]
    g, h, w = i0.shape
    l_t = p.lambda_ * p.theta
    taut = p.tau / p.theta
    nwin = 2 * d + 2
    pad = d + 1

    def warp3_full(u_, v_):
        """Window-warp (I1, I1x, I1y) by (u_, v_) with shared weights.

        Nested fori_loops with DYNAMIC pltpu.roll shifts (the one dynamic
        data-movement op Mosaic lowers efficiently): static-slice windows
        blow the VMEM stack past ~100 unrolled terms, dynamic ref offsets
        must be 8/128-aligned, and value-level dynamic_slice is unlowered.
        Rolling by pad+offset and reading [0:h, 0:w] never wraps content
        into view (padding margin >= the largest shift).

        MOSAIC BUG WORKAROUND (observed on v5e, jax 0.9): dynamic roll with
        a NEGATIVE shift along the sublane axis silently corrupts data —
        always roll by the positive complement (size - shift)."""
        zeros = jnp.zeros((g, h, w), jnp.float32)
        hh = i1p.shape[1]
        ww = i1p.shape[2]

        def outer(iy, accs):
            dy = iy - d
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(v_ - dy.astype(jnp.float32)))
            sy = hh - (pad + dy)  # == roll(-(pad+dy)), kept positive
            r0 = pltpu.roll(i1p, sy, 1)
            r1 = pltpu.roll(i1xp, sy, 1)
            r2 = pltpu.roll(i1yp, sy, 1)

            def inner(ix, accs2):
                a0, a1, a2 = accs2
                dx = ix - d
                wgt = wy * jnp.maximum(
                    0.0, 1.0 - jnp.abs(u_ - dx.astype(jnp.float32)))
                sx = ww - (pad + dx)
                s0 = pltpu.roll(r0, sx, 2)[:, :h, :w]
                s1 = pltpu.roll(r1, sx, 2)[:, :h, :w]
                s2 = pltpu.roll(r2, sx, 2)[:, :h, :w]
                return a0 + wgt * s0, a1 + wgt * s1, a2 + wgt * s2

            return jax.lax.fori_loop(0, nwin, inner, accs)

        return jax.lax.fori_loop(0, nwin, outer, (zeros, zeros, zeros))

    def _v_ext(v_):
        """Edge-extend v across the horizontal window margins (shared by the
        separable passes)."""
        ww = i1p.shape[2]
        left = jnp.broadcast_to(v_[..., :1], (g, h, pad))
        if ww - w - pad >= 0:
            right = jnp.broadcast_to(v_[..., -1:], (g, h, ww - w - pad))
            return jnp.concatenate([left, v_, right], axis=-1)
        return jnp.concatenate([left, v_[..., :ww - pad]], axis=-1)

    def warp3_separable(u_, v_):
        """Factorized window warp: vertical pass over the padded images with
        weights wy(v), then a horizontal pass with weights wx(u) — 2*nwin
        roll terms instead of nwin^2 (9x fewer at d=8). Exact when the flow
        is constant over the window; elsewhere the horizontal weight is
        sampled at (y, x+dx) instead of (y, x), an O(d*|du/dx|) error the
        TV prior keeps negligible (and the production pipeline quantizes
        flow to 20/127 px steps anyway). Margin columns of the intermediate
        use edge-clamped v, mirroring the edge-padded image reads."""
        hh = i1p.shape[1]
        ww = i1p.shape[2]
        v_ext = _v_ext(v_)  # margin columns carry edge-clamped weights
        zv = jnp.zeros((g, h, ww), jnp.float32)

        def vpass(iy, accs):
            a0, a1, a2 = accs
            dy = iy - d
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(v_ext - dy.astype(jnp.float32)))
            sy = hh - (pad + dy)  # positive complement (Mosaic roll bug)
            s0 = pltpu.roll(i1p, sy, 1)[:, :h, :]
            s1 = pltpu.roll(i1xp, sy, 1)[:, :h, :]
            s2 = pltpu.roll(i1yp, sy, 1)[:, :h, :]
            return a0 + wy * s0, a1 + wy * s1, a2 + wy * s2

        t0, t1, t2 = jax.lax.fori_loop(0, nwin, vpass, (zv, zv, zv))
        zh = jnp.zeros((g, h, w), jnp.float32)

        def hpass(ix, accs):
            a0, a1, a2 = accs
            dx = ix - d
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(u_ - dx.astype(jnp.float32)))
            sx = ww - (pad + dx)
            s0 = pltpu.roll(t0, sx, 2)[:, :, :w]
            s1 = pltpu.roll(t1, sx, 2)[:, :, :w]
            s2 = pltpu.roll(t2, sx, 2)[:, :, :w]
            return a0 + wx * s0, a1 + wx * s1, a2 + wx * s2

        return jax.lax.fori_loop(0, nwin, hpass, (zh, zh, zh))

    def warp1_separable(u_, v_):
        """Single-image factorized warp (grad_source='warped': the
        gradients come from differentiating the warped image, so only I1
        moves through the window loops — 1/3 the rolls)."""
        hh = i1p.shape[1]
        ww = i1p.shape[2]
        v_ext = _v_ext(v_)

        def vpass(iy, acc):
            dy = iy - d
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(v_ext - dy.astype(jnp.float32)))
            return acc + wy * pltpu.roll(i1p, hh - (pad + dy), 1)[:, :h, :]

        t = jax.lax.fori_loop(0, nwin, vpass, jnp.zeros((g, h, ww), jnp.float32))

        def hpass(ix, acc):
            dx = ix - d
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(u_ - dx.astype(jnp.float32)))
            return acc + wx * pltpu.roll(t, ww - (pad + dx), 2)[:, :, :w]

        return jax.lax.fori_loop(0, nwin, hpass, jnp.zeros((g, h, w), jnp.float32))

    def _grad_inkernel(x):
        """Centered spatial gradients with one-sided borders (the in-kernel
        analog of _centered_grad_batch), via positive-complement rolls."""
        col = jax.lax.broadcasted_iota(jnp.int32, (g, h, w), 2)
        row = jax.lax.broadcasted_iota(jnp.int32, (g, h, w), 1)
        xr = pltpu.roll(x, w - 1, 2)   # x[:, :, i+1] at position i
        xl = pltpu.roll(x, 1, 2)       # x[:, :, i-1]
        gx = jnp.where(col == 0, xr - x,
                       jnp.where(col == w - 1, x - xl, (xr - xl) * 0.5))
        xd = pltpu.roll(x, h - 1, 1)   # x[:, i+1, :]
        xu = pltpu.roll(x, 1, 1)       # x[:, i-1, :]
        gy = jnp.where(row == 0, xd - x,
                       jnp.where(row == h - 1, x - xu, (xd - xu) * 0.5))
        return gx, gy

    if grad_warped:
        def warp3(u_, v_):
            i1w = warp1_separable(u_, v_)
            i1wx, i1wy = _grad_inkernel(i1w)
            return i1w, i1wx, i1wy
    else:
        warp3 = warp3_separable if p.separable_warp else warp3_full

    p11 = jnp.zeros((g, h, w), jnp.float32)
    p12 = jnp.zeros_like(p11)
    p21 = jnp.zeros_like(p11)
    p22 = jnp.zeros_like(p11)

    for _warp in range(p.n_warps):
        u = jnp.clip(u, -d, d)
        v = jnp.clip(v, -d, d)
        i1w, i1wx, i1wy = warp3(u, v)
        grad = i1wx * i1wx + i1wy * i1wy
        rho_c = i1w - i1wx * u - i1wy * v - i0
        # Soft threshold as one clip: the 3-branch TV-L1 step
        #   rho < -th: +l_t | rho > th: -l_t | else: -rho/max(grad, eps)
        # with th = l_t*grad equals clip(-rho/max(grad, eps), -l_t, l_t)
        # in every case (|rho| <= th  =>  |rho/grad| <= l_t, and when
        # grad < eps, |rho| <= th <= l_t*eps  =>  |rho/eps| <= l_t).
        # Hoists the divide out of the iteration loop entirely.
        rgrad = 1.0 / jnp.maximum(grad, p.grad_eps)

        def inner(_, carry):
            u_, v_, q11, q12, q21, q22 = carry
            rho = rho_c + i1wx * u_ + i1wy * v_
            step = jnp.clip(-rho * rgrad, -l_t, l_t)
            u1 = u_ + step * i1wx
            v1 = v_ + step * i1wy
            un = u1 + p.theta * _divergence(q11, q12)
            vn = v1 + p.theta * _divergence(q21, q22)
            ux, uy = _forward_diff(un)
            vx, vy = _forward_diff(vn)
            gu = jnp.sqrt(ux * ux + uy * uy)
            gv = jnp.sqrt(vx * vx + vy * vy)
            ru = 1.0 / (1.0 + taut * gu)   # 2 reciprocals replace 4 divides
            rv = 1.0 / (1.0 + taut * gv)
            q11 = (q11 + taut * ux) * ru
            q12 = (q12 + taut * uy) * ru
            q21 = (q21 + taut * vx) * rv
            q22 = (q22 + taut * vy) * rv
            return un, vn, q11, q12, q21, q22

        u, v, p11, p12, p21, p22 = jax.lax.fori_loop(
            0, p.n_iters, inner, (u, v, p11, p12, p21, p22)
        )

    uo_ref[...] = u
    vo_ref[...] = v


def _warp_kernel(ip_ref, u_ref, v_ref, o_ref, *, d: int, separable: bool):
    """Generic multi-image window warp: o = bilinear_sample(i, y+v, x+u)
    for |u|,|v| <= d (same roll-window machinery as the level kernel;
    separable = the factorized 2*nwin variant)."""
    u_ = u_ref[...]
    v_ = v_ref[...]
    ip = ip_ref[...]
    g, h, w = u_.shape
    nwin = 2 * d + 2
    pad = d + 1
    hh, ww = ip.shape[1:]

    if separable:
        left = jnp.broadcast_to(v_[..., :1], (g, h, pad))
        if ww - w - pad >= 0:
            right = jnp.broadcast_to(v_[..., -1:], (g, h, ww - w - pad))
            v_ext = jnp.concatenate([left, v_, right], axis=-1)
        else:
            v_ext = jnp.concatenate([left, v_[..., :ww - pad]], axis=-1)

        def vpass(iy, acc):
            dy = iy - d
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(v_ext - dy.astype(jnp.float32)))
            return acc + wy * pltpu.roll(ip, hh - (pad + dy), 1)[:, :h, :]

        tmp = jax.lax.fori_loop(0, nwin, vpass,
                                jnp.zeros((g, h, ww), jnp.float32))

        def hpass(ix, acc):
            dx = ix - d
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(u_ - dx.astype(jnp.float32)))
            return acc + wx * pltpu.roll(tmp, ww - (pad + dx), 2)[:, :, :w]

        o_ref[...] = jax.lax.fori_loop(0, nwin, hpass,
                                       jnp.zeros((g, h, w), jnp.float32))
        return

    def outer(iy, acc):
        dy = iy - d
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(v_ - dy.astype(jnp.float32)))
        r0 = pltpu.roll(ip, hh - (pad + dy), 1)

        def inner(ix, a):
            dx = ix - d
            wgt = wy * jnp.maximum(0.0, 1.0 - jnp.abs(u_ - dx.astype(jnp.float32)))
            return a + wgt * pltpu.roll(r0, ww - (pad + dx), 2)[:, :h, :w]

        return jax.lax.fori_loop(0, nwin, inner, acc)

    o_ref[...] = jax.lax.fori_loop(0, nwin, outer,
                                   jnp.zeros((g, h, w), jnp.float32))


@functools.partial(jax.jit, static_argnames=("d", "separable",
                                             "pairs_per_program"))
def window_warp_pallas(img, u, v, d: int = 4, separable: bool = True,
                       pairs_per_program: int = 8):
    """Batched window warp [N, H, W]; flow clamped to +-d."""
    n, h, w = img.shape
    hp = _round_up(h, 8)
    wp = _round_up(w, 128)
    pad = d + 1
    hh = _round_up(h + 2 * pad, 8)
    ww = _round_up(w + 2 * pad, 128)
    g = _auto_pairs(hp, wp, hh, ww, pairs_per_program)
    n_pad = _round_up(n, g)
    imgp = jnp.pad(img, ((0, n_pad - n), (pad, hh - h - pad),
                         (pad, ww - w - pad)), mode="edge")
    # edge (not zero) pad: the separable pass samples v in the lane-rounded
    # margin columns; zero flow there would vertically unshift the border
    # samples the horizontal pass consumes
    up = jnp.pad(jnp.clip(u, -d, d),
                 ((0, n_pad - n), (0, hp - h), (0, wp - w)), mode="edge")
    vp = jnp.pad(jnp.clip(v, -d, d),
                 ((0, n_pad - n), (0, hp - h), (0, wp - w)), mode="edge")
    spec = pl.BlockSpec((g, hp, wp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    specp = pl.BlockSpec((g, hh, ww), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_warp_kernel, d=d, separable=separable),
        grid=(n_pad // g,),
        in_specs=[specp, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, hp, wp), jnp.float32),
        compiler_params=_VMEM_HEADROOM,
    )(imgp, up, vp)
    return out[:n, :h, :w]


def _affine_warp_rollwindow(img, A, d: int = 4):
    """Global-affine warp without gathers: integer translation via roll +
    residual displacement via the window warp. Handles arbitrarily large
    pans (the roll) with only a small window for the zoom/rotation residual.
    img [N, H, W], A [N, 2, 3] mapping output -> source DISPLACEMENT:
    src = [x, y] + A @ [x, y, 1]."""
    n, h, w = img.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    # displacement at the center -> integer roll component
    t = jnp.stack([
        A[:, 0, 0] * cx + A[:, 0, 1] * cy + A[:, 0, 2],
        A[:, 1, 0] * cx + A[:, 1, 1] * cy + A[:, 1, 2],
    ], axis=1)                                   # [N, 2] (dx, dy)
    t_int = jnp.round(t).astype(jnp.int32)
    # roll is circular; the residual window warp clamps at borders, and the
    # wrapped band (width <= |t|) only affects frame edges
    def roll_one(im, ti):
        return jnp.roll(jnp.roll(im, -ti[1], axis=0), -ti[0], axis=1)

    rolled = jax.vmap(roll_one)(img, t_int)
    du = (A[:, 0, 0, None, None] * xs + A[:, 0, 1, None, None] * ys
          + A[:, 0, 2, None, None]) - t_int[:, 0, None, None]
    dv = (A[:, 1, 0, None, None] * xs + A[:, 1, 1, None, None] * ys
          + A[:, 1, 2, None, None]) - t_int[:, 1, None, None]
    return window_warp_pallas(rolled, du, dv, d)


def _centered_grad_batch(img):
    """Centered spatial gradients, one-sided at borders (batch [N, H, W]);
    matches tvl1._centered_grad."""
    gx = (jnp.concatenate([img[:, :, 1:], img[:, :, -1:]], axis=2)
          - jnp.concatenate([img[:, :, :1], img[:, :, :-1]], axis=2))
    gy = (jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
          - jnp.concatenate([img[:, :1], img[:, :-1]], axis=1))
    w = img.shape[2]
    h = img.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, img.shape, 2)
    row = jax.lax.broadcasted_iota(jnp.int32, img.shape, 1)
    gx = jnp.where((col > 0) & (col < w - 1), gx * 0.5, gx)
    gy = jnp.where((row > 0) & (row < h - 1), gy * 0.5, gy)
    return gx, gy


def _round_up(x, m):
    return -(-x // m) * m


# The auto-pairs model targets 12 MB so double-buffering headroom remains,
# but raise Mosaic's hard scoped-VMEM ceiling (default 16 MB; v5e has 128 MB
# physical VMEM) so model misses and large full-res grids degrade to worse
# pipelining instead of failing compile.
_VMEM_HEADROOM = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _auto_pairs(hp: int, wp: int, hh: int, ww: int, requested: int) -> int:
    """Cap pairs-per-program so the kernel's VMEM working set fits.
    Live-set model calibrated against Mosaic's measured stack accounting
    (17.78 MB at G=4, hp=128 wp=256 hh=152 ww=256): ~24 plain [hp, wp]
    arrays (u/v/duals/warped/grads/temps incl. Mosaic spills) + 8
    window-padded [hh, ww] arrays, f32, against a 12 MB budget (16 MB VMEM
    minus pipeline slack)."""
    per_pair = (24 * hp * wp + 8 * hh * ww) * 4
    budget = 12 * 1024 * 1024
    g = max(1, min(requested, budget // max(per_pair, 1)))
    return g


@functools.partial(jax.jit, static_argnames=("p", "max_disp", "pairs_per_program"))
def tvl1_level_pallas(i0, i1, u, v, p: TVL1Params = TVL1Params(),
                      max_disp: int = 6, pairs_per_program: int = 1):
    """One TV-L1 pyramid level for a batch of frame pairs. i0, i1, u, v:
    f32[N, H, W]; returns updated (u, v).

    pairs_per_program (G) processes G pairs per Pallas grid program,
    vectorized on the leading block axis — the window rolls and all VPU ops
    amortize across the G pairs, cutting per-program dispatch overhead (the
    measured cost floor at G=1)."""
    n, h, w = i0.shape
    hp = _round_up(h, 8)
    wp = _round_up(w, 128)
    pad = max_disp + 1
    g = _auto_pairs(hp, wp, _round_up(h + 2 * pad, 8),
                    _round_up(w + 2 * pad, 128), pairs_per_program)
    n_pad = _round_up(n, g)

    def pad_plain(x):
        return jnp.pad(x, ((0, n_pad - n), (0, hp - h), (0, wp - w)),
                       mode="edge")

    def pad_window(x):
        # top/left margin exactly `pad`; bottom/right at least `pad`,
        # rounded so the padded array is (8, 128)-tile aligned for rolls
        hh = _round_up(h + 2 * pad, 8)
        ww = _round_up(w + 2 * pad, 128)
        return jnp.pad(x, ((0, n_pad - n), (pad, hh - h - pad),
                           (pad, ww - w - pad)), mode="edge")

    grad_warped = p.grad_source == "warped" and p.separable_warp
    i0p = pad_plain(i0)
    up = pad_plain(u)
    vp = pad_plain(v)
    i1p = pad_window(i1)
    if grad_warped:
        inputs = (i0p, i1p, up, vp)
    else:
        i1x, i1y = _centered_grad_batch(i1)
        inputs = (i0p, i1p, pad_window(i1x), pad_window(i1y), up, vp)

    hh = _round_up(h + 2 * pad, 8)
    ww = _round_up(w + 2 * pad, 128)
    spec = pl.BlockSpec((g, hp, wp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    spec_padded = pl.BlockSpec((g, hh, ww), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    if grad_warped:
        in_specs = [spec, spec_padded, spec, spec]
    else:
        in_specs = [spec, spec_padded, spec_padded, spec_padded, spec, spec]
    out_u, out_v = pl.pallas_call(
        functools.partial(_level_kernel, p=p, d=max_disp),
        compiler_params=_VMEM_HEADROOM,
        grid=(n_pad // g,),
        in_specs=in_specs,
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, hp, wp), jnp.float32),
        ],
    )(*inputs)
    return out_u[:n, :h, :w], out_v[:n, :h, :w]


def _resize2(img, hw):
    return jax.image.resize(img, img.shape[:-2] + hw, method="linear")


@functools.partial(jax.jit, static_argnames=("p", "max_disp", "pairs_per_program"))
def tvl1_flow_pallas(
    I0: jax.Array,  # f32 [N, H, W] in [0, 1]
    I1: jax.Array,
    p: TVL1Params = TVL1Params(),
    max_disp: int = 6,
    pairs_per_program: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Full pyramidal TV-L1 using the Pallas level kernel. The shift window
    shrinks with pyramid scale (flow magnitude scales with resolution)."""
    from videoquery.kernels.tvl1 import _pyramid_shapes

    shapes = _pyramid_shapes(I0.shape[1], I0.shape[2], p)
    pyr0 = [I0]
    pyr1 = [I1]
    for i in range(1, len(shapes)):
        pyr0.append(_resize2(pyr0[-1], shapes[i]))
        pyr1.append(_resize2(pyr1[-1], shapes[i]))

    n = I0.shape[0]
    u = jnp.zeros((n,) + shapes[-1], jnp.float32)
    v = jnp.zeros((n,) + shapes[-1], jnp.float32)
    for i in reversed(range(len(shapes))):
        d = max(2, round(max_disp * p.scale_step ** i))
        u, v = tvl1_level_pallas(pyr0[i], pyr1[i], u, v, p.at_level(i), d,
                                 pairs_per_program)
        if i > 0:
            inv = 1.0 / p.scale_step
            u = _resize2(u, shapes[i - 1]) * inv
            v = _resize2(v, shapes[i - 1]) * inv
    return u, v


def _rollwindow_warp_fields(img, du, dv, d: int = 4):
    """Warp img by arbitrary-magnitude displacement fields: per-pair
    integer roll by the field's center value + window warp for the
    residual (gather-free; residual must stay within ±d, true for global
    camera fields whose variation across the frame is small)."""
    tx = jnp.round(du[:, du.shape[1] // 2, du.shape[2] // 2]).astype(jnp.int32)
    ty = jnp.round(dv[:, dv.shape[1] // 2, dv.shape[2] // 2]).astype(jnp.int32)

    def roll_one(im, tx_, ty_):
        return jnp.roll(jnp.roll(im, -ty_, axis=0), -tx_, axis=1)

    rolled = jax.vmap(roll_one)(img, tx, ty)
    return window_warp_pallas(rolled, du - tx[:, None, None].astype(du.dtype),
                              dv - ty[:, None, None].astype(dv.dtype), d)


def _homography_warp_rollwindow(img, Hn, d: int = 4):
    """Global-homography warp without gathers — the projective analogue of
    _affine_warp_rollwindow. img [N, H, W], Hn [N, 3, 3] normalized-coords
    homography (kernels.motion.lk_homography_batch)."""
    from videoquery.kernels.motion import homography_displacement

    n, h, w = img.shape
    du, dv = homography_displacement(Hn, h, w)            # [N, h, w] px
    return _rollwindow_warp_fields(img, du, dv, d)


def refine_camera(I0: jax.Array, I1: jax.Array, p: TVL1Params,
                  coarse_hw: tuple[int, int] | None, Hn0: jax.Array,
                  n_iters: int = 3) -> jax.Array:
    """Refine a NEIGHBOR pair's camera homography on this pair: no
    translation pre-pass, LK warm-started at Hn0's parameters — the cheap
    middle ground between reusing the key's camera verbatim (stale:
    +0.08 EPE under the corrected lambda) and a full per-pair estimate
    (translation conv + 6 LK iters). The LK warp rolls by the field's
    center displacement so arbitrarily large pans stay inside the ±4
    residual window."""
    from videoquery.kernels.motion import (homography_params,
                                           lk_homography_batch)

    coarse_hw = coarse_hw or p.coarse_hw
    c0 = _resize2(I0, coarse_hw)
    c1 = _resize2(I1, coarse_hw)
    return lk_homography_batch(
        c0, c1, warp_fn=lambda img, u, v: _rollwindow_warp_fields(img, u, v),
        n_iters=n_iters, p0=homography_params(Hn0))


def estimate_camera(I0: jax.Array, I1: jax.Array, p: TVL1Params,
                    coarse_hw: tuple[int, int] | None) -> jax.Array:
    """Per-pair global camera motion (apply with apply_camera):
    p.camera_model == "affine"     -> A [N, 2, 3] displacement affine in
                                      I0's coords (the default), or
    p.camera_model == "homography" -> Hn [N, 3, 3] normalized-coords
                                      homography (8 params — dense_flow's
                                      model class, build_wof_clips.py:70-73;
                                      adds the two perspective columns an
                                      affine cannot express).

    Global motion = integer translation from one MXU cross-correlation
    (robust to pans of ANY size up to the correlation window — iterative
    TV-L1 alone under-converges on large pans over weak texture) + a
    parametric (LK) affine refinement on the translation-compensated coarse
    pair. The compensation warp is integer-roll translation + a small Pallas
    window warp for the affine residual — no gathers anywhere (a
    gather-based affine resample tripled total flow cost on this chip at
    ~50 ns/index). The LK fit replaces an earlier coarse-TV-L1 +
    IRLS-affine-fit: the TV prior flattens divergent fields (a 5% camera
    zoom came back at <10% magnitude, so zoom/rotation stayed
    uncompensated); direct Gauss-Newton on intensities recovers ~97% of a
    synthetic zoom."""
    from videoquery.kernels.motion import (affine_to_native_coords,
                                           global_translation,
                                           homography_translate,
                                           lk_affine_batch,
                                           lk_homography_batch)

    coarse_hw = coarse_hw or p.coarse_hw
    c0 = _resize2(I0, coarse_hw)
    c1 = _resize2(I1, coarse_hw)
    sx = I0.shape[2] / coarse_hw[1]
    sy = I0.shape[1] / coarse_hw[0]
    t = global_translation(c0, c1, max_shift=12)          # i32 [N, 2] (u, v)

    def roll_one(im, ti):
        # compensate: sample c1 at x + t  ==  roll contents left/up by t
        return jnp.roll(jnp.roll(im, -ti[1], axis=0), -ti[0], axis=1)

    c1t = jax.vmap(roll_one)(c1, t)
    warp_fn = lambda img, u, v: window_warp_pallas(img, u, v, d=4)  # noqa: E731
    if p.camera_model == "homography":
        Hn = lk_homography_batch(c0, c1t, warp_fn=warp_fn, n_iters=6)
        # fold the integer pre-translation in (normalized coords are
        # resolution-independent: Hn applies on ANY grid of the same FoV)
        return homography_translate(Hn, t[:, 0].astype(jnp.float32),
                                    t[:, 1].astype(jnp.float32),
                                    coarse_hw[1], coarse_hw[0])
    A = lk_affine_batch(c0, c1t, warp_fn=warp_fn, n_iters=6)
    # add the integer translation, scale VALUES (coarse px -> native px per
    # axis), then convert the fit's coarse COORDS to native coords
    A = A.at[:, 0, 2].add(t[:, 0].astype(jnp.float32))
    A = A.at[:, 1, 2].add(t[:, 1].astype(jnp.float32))
    A = A * jnp.asarray([sx, sy])[:, None]
    return affine_to_native_coords(A, sx, sy)


def apply_camera(I1: jax.Array, A: jax.Array) -> jax.Array:
    """Warp I1 by the camera field (integer-roll translation + window warp
    for the residual — gather-free). A [N, 2, 3] = affine displacement in
    I1's coords; [N, 3, 3] = normalized-coords homography."""
    if A.shape[-2] == 3:
        return _homography_warp_rollwindow(I1, A, d=4)
    return _affine_warp_rollwindow(I1, A, d=4)


def _camera_compensate(I0: jax.Array, I1: jax.Array, p: TVL1Params,
                       coarse_hw: tuple[int, int] | None) -> jax.Array:
    return apply_camera(I1, estimate_camera(I0, I1, p, coarse_hw))


@functools.partial(jax.jit,
                   static_argnames=("p", "max_disp", "coarse_hw",
                                    "pairs_per_program"))
def tvl1_warped_flow_pallas(
    I0: jax.Array,
    I1: jax.Array,
    p: TVL1Params = TVL1Params(),
    max_disp: int = 6,
    coarse_hw: tuple[int, int] | None = None,  # None -> p.coarse_hw
    pairs_per_program: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Warped (camera-motion-compensated) variant on the Pallas path: the
    two-pass structure of dense_flow's extract_warp_gpu
    (build_wof_clips.py:70-73)."""
    i1w = _camera_compensate(I0, I1, p, coarse_hw)
    return tvl1_flow_pallas(I0, i1w, p, max_disp=max_disp,
                            pairs_per_program=pairs_per_program)


@functools.partial(jax.jit,
                   static_argnames=("p", "max_disp", "coarse_hw",
                                    "pairs_per_program"))
def tvl1_warped_flow_pallas_cam(
    I0: jax.Array,
    I1: jax.Array,
    p: TVL1Params = TVL1Params(),
    max_disp: int = 6,
    coarse_hw: tuple[int, int] | None = None,
    pairs_per_program: int = 1,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Warped flow that ALSO returns the per-pair camera affine A [N, 2, 3]
    (so warm-started neighbor pairs can reuse it)."""
    A = estimate_camera(I0, I1, p, coarse_hw)
    u, v = tvl1_flow_pallas(I0, apply_camera(I1, A), p, max_disp=max_disp,
                            pairs_per_program=pairs_per_program)
    return u, v, A


@functools.partial(jax.jit,
                   static_argnames=("p", "max_disp", "levels",
                                    "pairs_per_program"))
def tvl1_flow_pallas_warm(
    I0: jax.Array,  # f32 [N, H, W] in [0, 1]
    I1: jax.Array,
    u0: jax.Array,  # f32 [N, H, W] initial flow (e.g. a neighbor pair's)
    v0: jax.Array,
    p: TVL1Params = TVL1Params(),
    max_disp: int = 6,
    levels: int = 1,
    pairs_per_program: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Warm-started TV-L1: refine an initial flow running only the finest
    `levels` pyramid levels (temporal warm start — consecutive pairs have
    highly correlated flow, so the coarse pyramid that exists to recover
    LARGE motion from zero is redundant when initialized from a neighbor's
    solution; VERDICT r2 #2). The level kernel clamps flow to ±max_disp per
    warp, matching the cold path's window."""
    from videoquery.kernels.tvl1 import _pyramid_shapes

    shapes = _pyramid_shapes(I0.shape[1], I0.shape[2], p)[:levels]
    pyr0 = [I0]
    pyr1 = [I1]
    for i in range(1, len(shapes)):
        pyr0.append(_resize2(pyr0[-1], shapes[i]))
        pyr1.append(_resize2(pyr1[-1], shapes[i]))
    scale = p.scale_step ** (len(shapes) - 1)
    u = _resize2(u0, shapes[-1]) * scale
    v = _resize2(v0, shapes[-1]) * scale
    for i in reversed(range(len(shapes))):
        d = max(2, round(max_disp * p.scale_step ** i))
        u, v = tvl1_level_pallas(pyr0[i], pyr1[i], u, v, p.at_level(i), d,
                                 pairs_per_program)
        if i > 0:
            inv = 1.0 / p.scale_step
            u = _resize2(u, shapes[i - 1]) * inv
            v = _resize2(v, shapes[i - 1]) * inv
    return u, v


@functools.partial(jax.jit,
                   static_argnames=("p", "max_disp", "coarse_hw", "levels",
                                    "pairs_per_program",
                                    "cam_refine_iters"))
def tvl1_warped_flow_pallas_warm(
    I0: jax.Array,
    I1: jax.Array,
    u0: jax.Array,
    v0: jax.Array,
    p: TVL1Params = TVL1Params(),
    max_disp: int = 6,
    coarse_hw: tuple[int, int] | None = None,
    levels: int = 1,
    pairs_per_program: int = 1,
    A: jax.Array | None = None,
    cam_refine_iters: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Warm-started warped variant. By default each pair still gets its OWN
    camera compensation (camera motion changes per pair); only the
    residual-flow solve is warm-started from the neighbor's residual.
    Passing A (e.g. the keyframe pair's estimate) skips the estimation and
    reuses it; with cam_refine_iters > 0 and a homography A, the key's
    estimate is instead REFINED on this pair with that many warm-started
    LK iterations (ExtractionConfig.flow_warm_camera="init")."""
    if A is None:
        i1w = _camera_compensate(I0, I1, p, coarse_hw)
    else:
        if cam_refine_iters > 0 and A.shape[-2] == 3:
            A = refine_camera(I0, I1, p, coarse_hw, A,
                              n_iters=cam_refine_iters)
        i1w = apply_camera(I1, A)
    return tvl1_flow_pallas_warm(I0, i1w, u0, v0, p, max_disp=max_disp,
                                 levels=levels,
                                 pairs_per_program=pairs_per_program)
