"""Winograd F(2x2,3x3) on TPU — measured NEGATIVE result (kept reproducible).

Stride-1 3x3 convs are ~63% of BN-Inception's FLOPs, so Winograd's 2.25x
multiply reduction looked like a major CNN lever. (This experiment was
originally motivated by a "93-100% MFU compute-bound" roofline figure
that was later withdrawn as RTT-polluted — docs/TUNING.md; the corrected
account puts the forward inside its conv-shape matmul envelope, and the
negative result below stands unchanged because it is shape-structural,
not ceiling-relative.)

Measured on the production shapes, it LOSES decisively, for a structural
reason no kernel engineering removes:

- direct conv lowers to implicit GEMM with contraction K = 9*Cin (576+)
  — MXU-native; Winograd's 16 per-coefficient matmuls contract over
  K = Cin only (64..256), padding to the 128-wide MXU tile and landing at
  ~7.7 TFLOP/s vs ~22 for the direct conv of the same layer. The Winograd
  MATMUL ALONE is slower than the entire direct convolution
  (28x28x96->96 at N=600: matmul 4.5 ms vs direct conv 3.5 ms), so even a
  perfect zero-cost Pallas transform cannot win.
- the data transforms (B^T d B / A^T m A), though pure add/sub chains,
  cost 5-13 ms/layer in XLA (4x activation-volume relayouts), several
  times the FLOPs they save.

This tool reproduces both measurements (stage split + full-layer compare)
plus the correctness of the transform, self-contained — the production
net intentionally ships NO Winograd path (see docs/TUNING.md "Lower-FLOP
restructuring"). Timing: final host readback; block_until_ready is a
no-op on tunneled backends.

Run: python tools/winograd_bench.py [--n 600] [--reps 8]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

# (n_images, hw, cin, cout): conv2/3x3-like, the two biggest inception
# families, and an odd-grid 5a shape. n is scaled down where the 16x
# transformed activations would not fit HBM alongside the comparison run.
SHAPES = [
    (600, 28, 96, 96),     # inception_3a/3b double_3x3_2
    (600, 14, 160, 192),   # inception_4c/4d 3x3 family
    (600, 7, 192, 320),    # inception_5a/3x3 (odd grid)
    (200, 56, 64, 192),    # conv2/3x3 (16x tile blowup: reduced n)
]


def transform_filter(w, jnp):
    G = jnp.asarray(
        np.array([[1.0, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1.0]],
                 np.float32))
    u = jnp.einsum("ai,ijck,bj->abck", G, w.astype(jnp.float32), G)
    return u.reshape(16, *u.shape[2:])


def make_fns(n, hw, cin, cout, jax, jnp, w, b, u):
    th = tw = -(-hw // 2)

    def direct(x):
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jax.nn.relu(y + b).astype(x.dtype)

    def bt(v):  # B^T rows: [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]
        return [v[0] - v[2], v[1] + v[2], v[2] - v[1], v[1] - v[3]]

    def at(m):  # A^T rows: [[1,1,1,0],[0,1,-1,-1]]
        return [m[0] + m[1] + m[2], m[1] - m[2] - m[3]]

    def vm_only(x):
        # phase decomposition: ONE relayout, then unit-stride window slices
        # (16 direct stride-2 views measured another ~2x worse)
        xp = jnp.pad(x, ((0, 0), (1, 2 * th + 1 - hw), (1, 2 * tw + 1 - hw),
                         (0, 0)))
        ph = xp.reshape(n, th + 1, 2, tw + 1, 2, cin).transpose(0, 2, 4, 1, 3, 5)
        d = [[ph[:, dy % 2, dx % 2, dy // 2:dy // 2 + th, dx // 2:dx // 2 + tw]
              for dx in range(4)] for dy in range(4)]
        rows = [bt([d[i][j] for i in range(4)]) for j in range(4)]
        v = [bt([rows[j][a] for j in range(4)]) for a in range(4)]
        return jnp.stack([v[a][c] for a in range(4) for c in range(4)]
                         ).reshape(16, n * th * tw, cin)

    def mm_only(vm):
        return jax.lax.dot_general(
            vm, u.astype(vm.dtype), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def wino(x):
        m = mm_only(vm_only(x)).astype(jnp.float32)
        m = m.reshape(4, 4, n, th, tw, cout)
        ra = [at([m[i, j] for i in range(4)]) for j in range(4)]
        y = [at([ra[j][a] for j in range(4)]) for a in range(2)]
        out = jnp.stack([y[a][c] for a in range(2) for c in range(2)], axis=3)
        out = out.reshape(n, th, tw, 2, 2, cout).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(n, 2 * th, 2 * tw, cout)[:, :hw, :hw, :]
        return jax.nn.relu(out + b).astype(x.dtype)

    return direct, wino, vm_only, mm_only


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    from videoquery.core.jaxsetup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    def timeit(fn, *a):
        out = fn(*a)
        _ = float(jnp.sum(out))
        t0 = time.time()
        for _ in range(args.reps):
            out = fn(*a)
        _ = float(jnp.sum(out))
        return (time.time() - t0) / args.reps

    rng = np.random.default_rng(0)
    for n, hw, cin, cout in SHAPES:
        x = jnp.asarray(rng.normal(size=(n, hw, hw, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.float32)
        b = jnp.asarray(np.zeros(cout), jnp.float32)
        u = transform_filter(w, jnp)
        direct, wino, vm_only, mm_only = make_fns(n, hw, cin, cout, jax, jnp,
                                                  w, b, u)
        # correctness: scalar readback only (full-tensor downloads run at
        # ~0.7 MB/s over the tunnel)
        @jax.jit
        def relerr(x):
            d = direct(x).astype(jnp.float32)
            g = wino(x).astype(jnp.float32)
            return jnp.abs(d - g).max() / jnp.maximum(jnp.abs(d).max(), 1e-6)

        err = float(relerr(x))
        td = timeit(jax.jit(direct), x)
        tw_ = timeit(jax.jit(wino), x)
        tv = timeit(jax.jit(vm_only), x)
        vm = jax.jit(vm_only)(x)
        _ = float(vm.sum())
        tm = timeit(jax.jit(mm_only), vm)
        gf_direct = 2 * n * hw * hw * 9 * cin * cout / 1e9
        gf_wino = 16 * n * (-(-hw // 2)) ** 2 * 2 * cin * cout / 1e9
        print(f"{n}x{hw}x{hw} {cin}->{cout}: direct {td*1e3:7.2f} ms "
              f"({gf_direct/td/1e3:5.1f} TF/s) | wino {tw_*1e3:7.2f} ms "
              f"[transform {tv*1e3:6.2f} + matmul {tm*1e3:6.2f} "
              f"({gf_wino/tm/1e3:5.1f} TF/s) + inverse] | "
              f"rel err {err:.1e}", flush=True)
        del x, vm


if __name__ == "__main__":
    main()
