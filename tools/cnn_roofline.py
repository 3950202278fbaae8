"""Roofline account of the BN-Inception ensemble forward pass.

VERDICT r2 #1: make the ensemble's bottleneck checkable. The tool builds a
per-layer analytic model of FLOPs and HBM bytes for the exact production
geometry, measures the real forward time, and reports achieved TFLOP/s and
GB/s against the chip's ceilings — which it MEASURES at runtime with long
scan chains (short-chain ceiling runs are RTT-polluted over the tunnel and
once understated both ceilings ~2.5x, misdiagnosing the forward as
compute-bound; see the note at the ceiling functions).

Two byte models bound the attainable range:
  - "xla" traffic: every conv reads its input from HBM and writes its
    output (inception block inputs are re-read by each of the 4 branches;
    pools read+write) — what the unfused program must move.
  - "ideal" traffic: every activation is read ONCE and written once
    (perfect inter-branch fusion) — the floor a fused inception kernel
    could approach. The gap between the two is the total fusion headroom.

Run: python tools/cnn_roofline.py [--images 600] [--reps 8]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from videoquery.nn.bn_inception import INCEPTION_BLOCKS

BYTES = 2  # bfloat16 activations/weights

HBM_NOMINAL_GBPS = 819.0  # v5e datasheet
MXU_NOMINAL_TFLOPS = 197.0

# Ceilings are MEASURED at runtime with long scan chains (one host sync per
# ~50+ chained iterations). The round-3 first-pass account used 59 TFLOP/s /
# 278 GB/s constants from short-chain runs — those were RTT-polluted (each
# device sync over the tunnel costs ~25-400 ms, comparable to the compute
# being timed) and understated both ceilings ~2.5x, flipping the verdict to
# "compute-bound at 93-100% MFU". Long chains measure ~160-175 TFLOP/s and
# ~450 GB/s on the same chip: the ensemble forward is TRAFFIC-bound.


def measure_matmul_peak(m: int = 4096, iters: int = 200) -> float:
    """bf16 matmul TFLOP/s via a scan-chained m^3 dot (one sync total)."""
    import jax
    import jax.numpy as jnp

    a = jax.random.normal(jax.random.PRNGKey(0), (m, m), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (m, m), jnp.bfloat16)

    def chain(a, b):
        def body(x, _):
            y = jnp.dot(x, b, preferred_element_type=jnp.float32)
            return (y * 0.01).astype(jnp.bfloat16), None
        x, _ = jax.lax.scan(body, a, None, length=iters)
        return x.sum()

    f = jax.jit(chain)
    _ = float(f(a, b))
    best = 1e9
    for _t in range(3):
        t0 = time.time()
        _ = float(f(a, b))
        best = min(best, time.time() - t0)
    return 2 * m**3 * iters / best / 1e12


def measure_conv_shape_envelope() -> list[tuple[str, float]]:
    """Matmul TFLOP/s at the net's own implicit-GEMM shapes. The 4096^3
    peak is NOT attainable at conv shapes: cout (the GEMM N) is 64-352
    lanes and the 1x1 layers contract only K=cin — both underfill the MXU
    tiling. This envelope, not the square-matmul peak, is the CNN's real
    compute ceiling."""
    import jax
    import jax.numpy as jnp

    shapes = [
        ("28x28 3x3 (K=1728,N=320)", 600 * 28 * 28, 1728, 320),
        ("14x14 3x3 (K=864,N=192)", 600 * 14 * 14, 864, 192),
        ("7x7 1x1 (K=1024,N=1024)", 600 * 7 * 7, 1024, 1024),
        ("28x28 1x1 (K=256,N=128)", 600 * 28 * 28, 256, 128),
    ]
    out = []
    for label, m, kk, nn in shapes:
        a = jax.random.normal(jax.random.PRNGKey(0), (m, kk), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (kk, nn), jnp.bfloat16)
        c = jax.random.normal(jax.random.PRNGKey(2), (nn, kk), jnp.bfloat16)

        def chain(a, b, c, iters=30):
            def body(x, _):
                y = jnp.dot(x, b, preferred_element_type=jnp.float32)
                z = jnp.dot(y.astype(jnp.bfloat16), c,
                            preferred_element_type=jnp.float32)
                return (z * 0.01).astype(jnp.bfloat16), None
            x, _ = jax.lax.scan(body, a, None, length=iters)
            return x.sum()

        f = jax.jit(chain)
        _ = float(f(a, b, c))
        best = 1e9
        for _t in range(2):
            t0 = time.time()
            _ = float(f(a, b, c))
            best = min(best, time.time() - t0)
        out.append((label, 2 * m * kk * nn * 2 * 30 / best / 1e12))
    return out


def measure_hbm_read(gib: int = 2, iters: int = 40) -> float:
    """Achievable HBM read GB/s via a chained full-array reduction."""
    import jax
    import jax.numpy as jnp

    n = gib * (1 << 29)
    x = jax.random.normal(jax.random.PRNGKey(0), (n,), jnp.bfloat16)

    def chain(x):
        def body(c, _):
            s = jnp.sum(x.astype(jnp.float32) * c)
            return c + s * 1e-30, None
        c, _ = jax.lax.scan(body, jnp.float32(1.0), None, length=iters)
        return c

    f = jax.jit(chain)
    _ = float(f(x))
    best = 1e9
    for _t in range(3):
        t0 = time.time()
        _ = float(f(x))
        best = min(best, time.time() - t0)
    return 2 * n * iters / best / 1e9


def conv_cost(n, h, w, k, s, cin, cout):
    ho, wo = h // s, w // s
    flops = 2 * n * ho * wo * k * k * cin * cout
    read = n * h * w * cin * BYTES
    write = n * ho * wo * cout * BYTES
    weights = k * k * cin * cout * BYTES
    return flops, read, write, weights, (ho, wo)


def model(n_images: int, in_channels: int):
    """Per-layer cost table for one ensemble member."""
    rows = []  # (name, flops, hbm_read, hbm_write, weight_bytes)

    def add(name, flops, r, w, wt):
        rows.append((name, flops, r, w, wt))

    n = n_images
    # stem (space-to-depth 4x4 conv over 112x112x4C)
    c = in_channels
    f, r, w, wt, _ = conv_cost(n, 112, 112, 4, 1, 4 * c, 64)
    add("conv1/7x7_s2(s2d)", f, r, w, wt)
    h = 112
    add("pool1 3x3/2", 0, n * h * h * 64 * BYTES, n * 56 * 56 * 64 * BYTES, 0)
    f, r, w, wt, _ = conv_cost(n, 56, 56, 1, 1, 64, 64)
    add("conv2/3x3_reduce", f, r, w, wt)
    f, r, w, wt, _ = conv_cost(n, 56, 56, 3, 1, 64, 192)
    add("conv2/3x3", f, r, w, wt)
    add("pool2 3x3/2", 0, n * 56 * 56 * 192 * BYTES,
        n * 28 * 28 * 192 * BYTES, 0)

    hw = 28
    cin = 192
    for name, b in INCEPTION_BLOCKS:
        s = b["stride"]
        ho = hw // s
        x_bytes = n * hw * hw * cin * BYTES
        # branch 1: 1x1
        if b["c1"]:
            f, r, w, wt, _ = conv_cost(n, hw, hw, 1, 1, cin, b["c1"])
            add(f"{name}/1x1", f, r, w, wt)
        # branch 2: reduce + 3x3
        f, r, w, wt, _ = conv_cost(n, hw, hw, 1, 1, cin, b["r3"])
        add(f"{name}/3x3_reduce", f, r, w, wt)
        f, r, w, wt, _ = conv_cost(n, hw, hw, 3, s, b["r3"], b["c3"])
        add(f"{name}/3x3", f, r, w, wt)
        # branch 3: reduce + 3x3 + 3x3
        f, r, w, wt, _ = conv_cost(n, hw, hw, 1, 1, cin, b["rd"])
        add(f"{name}/d3x3_reduce", f, r, w, wt)
        f, r, w, wt, _ = conv_cost(n, hw, hw, 3, 1, b["rd"], b["d1"])
        add(f"{name}/d3x3_1", f, r, w, wt)
        f, r, w, wt, _ = conv_cost(n, hw, hw, 3, s, b["d1"], b["d2"])
        add(f"{name}/d3x3_2", f, r, w, wt)
        # branch 4: pool (+proj)
        if s == 1:
            add(f"{name}/pool", 0, x_bytes, x_bytes, 0)
            if b["pp"]:
                f, r, w, wt, _ = conv_cost(n, hw, hw, 1, 1, cin, b["pp"])
                add(f"{name}/pool_proj", f, r, w, wt)
            cout = b["c1"] + b["c3"] + b["d2"] + b["pp"]
        else:
            add(f"{name}/pool(s2)", 0, x_bytes,
                n * ho * ho * cin * BYTES, 0)
            cout = b["c3"] + b["d2"] + cin
        hw, cin = ho, cout
    add("global_pool 7x7", 0, n * 7 * 7 * 1024 * BYTES, n * 1024 * 4, 0)
    return rows


def ideal_bytes(rows):
    """Perfect-fusion floor: each inception block reads its input once
    (branches share the read in VMEM) and writes only the concat output;
    intra-block reduce intermediates never touch HBM."""
    total = 0
    seen_block_inputs: dict[str, int] = {}
    for name, _f, r, w, _wt in rows:
        blk = name.split("/")[0]
        if blk.startswith("inception"):
            # one input read per block; one output write per branch (the
            # concat target); reduce/d3x3_1 intermediates stay in VMEM
            leaf = name.split("/")[1]
            if blk not in seen_block_inputs:
                seen_block_inputs[blk] = r  # the shared x read
                total += r
            if leaf in ("1x1", "3x3", "d3x3_2", "pool_proj", "pool(s2)"):
                total += w
            if leaf == "pool" and blk not in ():
                pass  # fused into pool_proj
        else:
            total += r + w
    total += sum(wt for *_a, wt in rows)
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=200,
                    help="images per ensemble member per stream (8 clips x "
                         "25 ticks = 200, the production batch)")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--splits", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from videoquery.core.jaxsetup import setup_jax

    setup_jax()

    from videoquery.nn import bn_inception
    from videoquery.nn.tsn import StreamEnsemble

    mxu_tflops = measure_matmul_peak()
    hbm_gbps = measure_hbm_read()
    print(f"[ceilings] measured bf16 matmul {mxu_tflops:.0f} TFLOP/s "
          f"({100*mxu_tflops/MXU_NOMINAL_TFLOPS:.0f}% of v5e nominal), "
          f"HBM read {hbm_gbps:.0f} GB/s "
          f"({100*hbm_gbps/HBM_NOMINAL_GBPS:.0f}% of nominal)")
    for label, tf in measure_conv_shape_envelope():
        print(f"[ceilings] conv-shape matmul {label}: {tf:.0f} TFLOP/s")

    n = args.images
    report = {}
    for stream, cin in (("rgb", 3), ("flow", 10)):
        rows = model(n, cin)
        k = args.splits
        flops = sum(f for _n, f, *_ in rows) * k
        xla_b = sum(r + w for _n, _f, r, w, _wt in rows) * k \
            + sum(wt for *_a, wt in rows) * k
        ideal_b = ideal_bytes(rows) * k

        ens = StreamEnsemble.random(jax.random.PRNGKey(0), cin,
                                    splits=tuple(range(1, k + 1)),
                                    dtype=jnp.bfloat16)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(n, 224, 224, cin)),
            jnp.bfloat16)

        fwd = jax.jit(lambda p, xx: jax.vmap(
            lambda q: bn_inception.embed(q, xx))(p))
        out = fwd(ens.stacked_params, x)
        _ = float(out.sum())  # sync (block_until_ready is a no-op here)
        t0 = time.time()
        for _ in range(args.reps):
            out = fwd(ens.stacked_params, x)
        _ = float(out.sum())
        dt = (time.time() - t0) / args.reps

        tflops = flops / dt / 1e12
        gbps = xla_b / dt / 1e9
        ideal_ms = ideal_b / (hbm_gbps * 1e9) * 1e3
        mxu_ms = flops / (mxu_tflops * 1e12) * 1e3
        report[stream] = dict(
            ms=dt * 1e3, tflops=tflops, gbps=gbps,
            xla_gb=xla_b / 1e9, ideal_gb=ideal_b / 1e9,
            ideal_ms=ideal_ms, mxu_ms=mxu_ms)
        print(f"[{stream}] {k}-member x {n} imgs: {dt*1e3:7.1f} ms | "
              f"{flops/1e9:6.1f} GFLOP -> {tflops:5.1f} TFLOP/s "
              f"({100*tflops/mxu_tflops:4.1f}% of measured peak) | "
              f"xla-traffic {xla_b/1e9:5.2f} GB -> {gbps:5.1f} GB/s "
              f"({100*gbps/hbm_gbps:5.1f}% of measured achievable)")
        print(f"[{stream}] bounds: MXU-only {mxu_ms:5.1f} ms | "
              f"xla-traffic/measured {xla_b/hbm_gbps/1e6:5.1f} ms | "
              f"ideal-fusion/measured {ideal_ms:5.1f} ms | nominal-HBM "
              f"xla-traffic {xla_b/HBM_NOMINAL_GBPS/1e6:5.1f} ms")
    both = report["rgb"]["ms"] + report["flow"]["ms"]
    print(f"[total] rgb+flow per 8-clip batch: {both:5.1f} ms "
          f"(= {8/both*1e3:5.1f} clips/s CNN-only ceiling)")
    print("[note] fusion headroom = xla-traffic - ideal-fusion bounds above;"
          " if measured ms ~= xla-traffic bound, the program is at the"
          " bandwidth roofline and only fusion or healthier HBM move it.")


if __name__ == "__main__":
    main()
