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
