"""Global (camera) motion estimation for warped optical flow.

dense_flow's extract_warp_gpu cancels camera motion by estimating a
homography from SURF matches + flow correspondences and warping the second
frame before the final TV-L1 pass (invoked at build_wof_clips.py:70-73; the
implementation lives in the external dense_flow C++/CUDA project).

TPU-native replacement: fit a global affine motion model to a coarse flow
field by iteratively reweighted least squares (robust to foreground
outliers). An affine fit on dense flow is the compiler-friendly equivalent —
no feature detection, no RANSAC branching, one small 6x6 solve — and for
camera pan/zoom/rotation it captures the same compensation. All array ops,
jit/vmap-able."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def estimate_affine(
    flow_u: jax.Array,  # [H, W] dx at each pixel
    flow_v: jax.Array,  # [H, W] dy
    n_irls: int = 3,
    delta: float = 1.0,
) -> jax.Array:
    """Fit (u, v) ~ affine(x, y): returns the 2x3 matrix A with
    src = [x, y] + A @ [x, y, 1] being the background motion.

    IRLS with a Huber-style weight 1/max(residual, delta) downweights
    independently moving foreground objects."""
    h, w = flow_u.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).ravel()
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).ravel()
    # normalize coordinates for conditioning
    sx, sy = 2.0 / w, 2.0 / h
    xn = xs * sx - 1.0
    yn = ys * sy - 1.0
    ones = jnp.ones_like(xn)
    G = jnp.stack([xn, yn, ones], axis=1)            # [N, 3]
    u = flow_u.ravel()
    v = flow_v.ravel()

    def solve(weights):
        gw = G * weights[:, None]                     # [N, 3]
        gtg = G.T @ gw + 1e-6 * jnp.eye(3)
        au = jnp.linalg.solve(gtg, gw.T @ u)          # [3]
        av = jnp.linalg.solve(gtg, gw.T @ v)
        return au, av

    def body(carry, _):
        au, av = carry
        ru = G @ au - u
        rv = G @ av - v
        r = jnp.sqrt(ru * ru + rv * rv + 1e-8)
        wgt = jnp.minimum(1.0, delta / r)
        return solve(wgt), None

    init = solve(jnp.ones_like(u))
    (au, av), _ = jax.lax.scan(body, init, None, length=n_irls)
    # un-normalize: u = au0*(x*sx-1) + au1*(y*sy-1) + au2
    A = jnp.asarray([
        [au[0] * sx, au[1] * sy, au[2] - au[0] - au[1]],
        [av[0] * sx, av[1] * sy, av[2] - av[0] - av[1]],
    ])
    return A


def affine_to_warp(A: jax.Array, h: int, w: int) -> jax.Array:
    """2x3 background-motion matrix -> absolute source-coordinate affine for
    warp_affine: src = [x, y] + A@[x, y, 1] = (I + A_lin) @ [x, y, 1]."""
    return A + jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])


estimate_affine_batch = jax.vmap(estimate_affine)


def global_translation(
    c0: jax.Array,  # [N, H, W] coarse grayscale
    c1: jax.Array,
    max_shift: int = 12,
) -> jax.Array:
    """Integer global translation per pair via zero-mean cross-correlation,
    computed as ONE depthwise convolution on the MXU (robust to any pan size
    up to max_shift at this resolution — the piece iterative TV-L1 struggles
    with). Returns i32 [N, 2] (dx, dy): c1 shifted by -t aligns with c0."""
    n, h, w = c0.shape
    a = c0 - c0.mean(axis=(1, 2), keepdims=True)
    b = c1 - c1.mean(axis=(1, 2), keepdims=True)
    # kernel: interior of b; slide over a -> [1, N, 2m+1, 2m+1]
    m = max_shift
    kern = b[:, m:h - m, m:w - m][:, None]               # [N, 1, h-2m, w-2m]
    corr = jax.lax.conv_general_dilated(
        a[None],                                          # [1, N, H, W]
        kern,
        window_strides=(1, 1),
        padding="VALID",
        feature_group_count=n,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )[0]                                                  # [N, 2m+1, 2m+1]
    flat = corr.reshape(n, -1)
    idx = jnp.argmax(flat, axis=1)
    # correlation peak at offset (dy, dx) means b's interior matches a at
    # position (dy, dx); zero shift corresponds to (m, m)
    dy = idx // (2 * m + 1) - m
    dx = idx % (2 * m + 1) - m
    # a[y + m + dy', x + ...]: b(y) matches a(y + dy) => flow c0->c1 is -d
    return jnp.stack([-dx, -dy], axis=1).astype(jnp.int32)
