"""Does the int8 MXU path reach the CNN ensemble? Conv vs matmul A/B.

The corrected roofline (tools/cnn_roofline.py, docs/TUNING.md) measured a
real 1.69x int8 matmul path on this chip (277 TOP/s vs 164 TFLOP/s bf16,
long scan chains). The only way that helps extraction is if XLA's TPU
*conv* lowering also uses it — the ensemble's FLOPs are
lax.conv_general_dilated calls, not jnp.dot (bn_inception.py:189).

This tool measures, per layer geometry of the production net (the same
implicit-GEMM shapes the roofline's conv-shape envelope covers, at the
production 600-image dense-member batch):
  1. bf16 conv vs int8 conv (preferred_element_type int32) throughput;
  2. bf16 dot vs int8 dot at the SAME GEMM shape (control: shows whether
     the shape itself or the conv lowering eats the int8 advantage);
  3. the FLOP-weighted projected whole-forward speedup of a W8A8 ensemble
     if every conv got its per-shape measured ratio (quantize/dequantize
     overhead NOT included, so this is an upper bound).

All timings force a scalar host readback (block_until_ready is a no-op on
this backend) and chain iterations inside one lax.scan so the tunnel's
per-dispatch RTT is amortized — the same methodology correction that
produced the 1.69x matmul figure in the first place. The scan carry
perturbs the conv input and consumes the FULL output (y.sum()); feeding
the carry from a single output element lets XLA slice the conv to one
pixel and report fantasy TFLOP/s (measured: 178,000 "TFLOP/s").

Reference parity note: the production ensemble stays bf16 regardless —
the north star requires embedding-level tolerance against the reference
TSN caffemodels (calcSig_wOF.py:88-113); this tool only closes or opens
the throughput-over-parity int8 option with a measurement.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

from videoquery.core.jaxsetup import setup_jax

setup_jax()

import jax
import jax.numpy as jnp

# (label, h, k, stride, cin, cout) at the production dense-member batch
# n=600 (8 clips x 25 ticks x 3 splits; grouped-vs-dense measured equal,
# TUNING.md). Together these geometries carry ~90% of the net's FLOPs
# (per-layer model in tools/cnn_roofline.py).
LAYERS = [
    ("stem s2d 112x112 k4 12->64", 112, 4, 1, 12, 64),
    ("conv2/3x3 56x56 64->192", 56, 3, 1, 64, 192),
    ("28x28 1x1 256->128", 28, 1, 1, 256, 128),
    ("28x28 3x3 64->96", 28, 3, 1, 64, 96),
    ("28x28 3x3(x2) 96->96", 28, 3, 1, 96, 96),
    ("14x14 1x1 576->192", 14, 1, 1, 576, 192),
    ("14x14 3x3 96->192", 14, 3, 1, 96, 192),
    ("7x7 1x1 1024->352", 7, 1, 1, 1024, 352),
    ("7x7 3x3 192->320", 7, 3, 1, 192, 320),
]


def _time_scalar(f, *args, reps: int = 2) -> float:
    _ = float(f(*args))  # compile + warm
    best = 1e9
    for _t in range(reps):
        t0 = time.time()
        _ = float(f(*args))
        best = min(best, time.time() - t0)
    return best


def bench_conv(dtype, n, h, k, s, cin, cout, iters) -> float:
    """Seconds per conv at the given geometry (scan-chained)."""
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    if dtype == jnp.int8:
        x0 = jax.random.randint(kx, (n, h, h, cin), -127, 127, jnp.int8)
        w = jax.random.randint(kw, (k, k, cin, cout), -127, 127, jnp.int8)
        acc = jnp.int32
    else:
        x0 = jax.random.normal(kx, (n, h, h, cin), dtype)
        w = jax.random.normal(kw, (k, k, cin, cout), dtype)
        acc = jnp.float32
    pad = (k - 1) // 2

    def chain(x0, w):
        def body(c, _):
            xin = (x0 + c).astype(dtype)
            y = jax.lax.conv_general_dilated(
                xin, w, (s, s), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc)
            tot = y.sum()
            c2 = ((tot % 3) if acc == jnp.int32 else tot * 1e-12).astype(
                x0.dtype)
            return c2, None
        c, _ = jax.lax.scan(body, jnp.zeros((), x0.dtype), None, length=iters)
        return c

    return _time_scalar(jax.jit(chain), x0, w) / iters


def bench_dot(dtype, m, kk, nn, iters) -> float:
    """Seconds per [m,kk]x[kk,nn] dot at the conv's implicit-GEMM shape."""
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    if dtype == jnp.int8:
        a0 = jax.random.randint(kx, (m, kk), -127, 127, jnp.int8)
        b = jax.random.randint(kw, (kk, nn), -127, 127, jnp.int8)
        acc = jnp.int32
    else:
        a0 = jax.random.normal(kx, (m, kk), dtype)
        b = jax.random.normal(kw, (kk, nn), dtype)
        acc = jnp.float32

    def chain(a0, b):
        def body(c, _):
            a = (a0 + c).astype(dtype)
            y = jnp.dot(a, b, preferred_element_type=acc)
            tot = y.sum()
            c2 = ((tot % 3) if acc == jnp.int32 else tot * 1e-12).astype(
                a0.dtype)
            return c2, None
        c, _ = jax.lax.scan(body, jnp.zeros((), a0.dtype), None, length=iters)
        return c

    return _time_scalar(jax.jit(chain), a0, b) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=600,
                    help="dense-member batch (8 clips x 25 ticks x 3 splits)")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--no_dot_control", action="store_true")
    ap.add_argument("--bf16_only", action="store_true",
                    help="skip the int8 columns: measures whether XLA's "
                         "bf16 CONV lowering itself leaves headroom vs a "
                         "same-GEMM-shape dot (it does not — measured "
                         "conv/dot 0.49-1.07x across every geometry, i.e. "
                         "the conv is at-or-below the im2col dot's cost; "
                         "docs/TUNING.md conv-lowering section)")
    args = ap.parse_args()
    n = args.images

    if args.bf16_only:
        print(f"{'layer':34s} {'conv bf16 ms':>12s} {'dot bf16 ms':>12s} "
              f"{'conv/dot':>9s}")
        for label, h, k, s, cin, cout in LAYERS:
            t_c = bench_conv(jnp.bfloat16, n, h, k, s, cin, cout, args.iters)
            ho = h // s
            m, gk = n * ho * ho, k * k * cin
            t_d = bench_dot(jnp.bfloat16, m, gk, cout, args.iters)
            print(f"{label:34s} {t_c*1e3:12.2f} {t_d*1e3:12.2f} "
                  f"{t_c/t_d:9.2f}x", flush=True)
        return

    print(f"{'layer':34s} {'bf16 ms':>8s} {'int8 ms':>8s} {'ratio':>6s}"
          f"{'':2s}{'dot bf16':>9s} {'dot int8':>9s} {'ratio':>6s}")
    tot_bf16 = tot_int8 = 0.0
    for label, h, k, s, cin, cout in LAYERS:
        t_bf = bench_conv(jnp.bfloat16, n, h, k, s, cin, cout, args.iters)
        t_i8 = bench_conv(jnp.int8, n, h, k, s, cin, cout, args.iters)
        tot_bf16 += t_bf
        tot_int8 += t_i8
        row = f"{label:34s} {t_bf*1e3:8.2f} {t_i8*1e3:8.2f} {t_bf/t_i8:6.2f}x"
        if not args.no_dot_control:
            ho = h // s
            m, gk = n * ho * ho, k * k * cin
            d_bf = bench_dot(jnp.bfloat16, m, gk, cout, args.iters)
            d_i8 = bench_dot(jnp.int8, m, gk, cout, args.iters)
            row += f"  {d_bf*1e3:9.2f} {d_i8*1e3:9.2f} {d_bf/d_i8:6.2f}x"
        print(row)

    print(f"\n[sum over measured geometries] bf16 {tot_bf16*1e3:.1f} ms, "
          f"int8 {tot_int8*1e3:.1f} ms -> projected W8A8 conv speedup "
          f"{tot_bf16/tot_int8:.2f}x (upper bound: excludes "
          f"quantize/dequantize/requantize traffic)")


if __name__ == "__main__":
    main()
