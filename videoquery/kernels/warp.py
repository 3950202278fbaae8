"""Bilinear warping primitives (batched, XLA-fused gathers)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _grid(h: int, w: int) -> tuple[jax.Array, jax.Array]:
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return ys, xs


def bilinear_sample(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Sample img [H, W] at float coords (ys, xs) [H', W'] with border clamp."""
    h, w = img.shape
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    wy = ys - y0
    wx = xs - x0
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def bilinear_warp(img: jax.Array, flow_u: jax.Array, flow_v: jax.Array
                  ) -> jax.Array:
    """Warp img [H, W] by flow (u=dx, v=dy): out(y, x) = img(y+v, x+u)."""
    ys, xs = _grid(*img.shape)
    return bilinear_sample(img, ys + flow_v, xs + flow_u)


def warp_affine(img: jax.Array, A: jax.Array) -> jax.Array:
    """Warp by 2x3 affine A mapping output coords -> source coords:
    src = A @ [x, y, 1]."""
    ys, xs = _grid(*img.shape)
    sx = A[0, 0] * xs + A[0, 1] * ys + A[0, 2]
    sy = A[1, 0] * xs + A[1, 1] * ys + A[1, 2]
    return bilinear_sample(img, sy, sx)


# batched variants over a leading axis
bilinear_warp_batch = jax.vmap(bilinear_warp)
warp_affine_batch = jax.vmap(warp_affine)
