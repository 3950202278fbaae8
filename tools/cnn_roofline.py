"""Roofline account of the BN-Inception ensemble forward pass.

VERDICT r2 #1: the CNN ensemble (~98 ms per 8-clip batch) is claimed to be
HBM-bandwidth-bound on this chip (measured achievable read ~278 GB/s vs
819 nominal). This tool makes that claim checkable: it builds a per-layer
analytic model of FLOPs and HBM bytes for the exact production geometry,
measures the real forward time, and reports achieved TFLOP/s and GB/s
against the chip's measured ceilings.

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

# measured on this tunnel chip (memory/tpu-env-gotchas): achievable HBM read
# bandwidth and bf16 matmul peak
HBM_GBPS = 278.0
HBM_NOMINAL_GBPS = 819.0
MXU_TFLOPS = 59.0


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
        ideal_ms = ideal_b / (HBM_GBPS * 1e9) * 1e3
        mxu_ms = flops / (MXU_TFLOPS * 1e12) * 1e3
        report[stream] = dict(
            ms=dt * 1e3, tflops=tflops, gbps=gbps,
            xla_gb=xla_b / 1e9, ideal_gb=ideal_b / 1e9,
            ideal_ms=ideal_ms, mxu_ms=mxu_ms)
        print(f"[{stream}] {k}-member x {n} imgs: {dt*1e3:7.1f} ms | "
              f"{flops/1e9:6.1f} GFLOP -> {tflops:5.1f} TFLOP/s "
              f"({100*tflops/MXU_TFLOPS:4.1f}% of measured peak) | "
              f"xla-traffic {xla_b/1e9:5.2f} GB -> {gbps:5.1f} GB/s "
              f"({100*gbps/HBM_GBPS:5.1f}% of measured achievable)")
        print(f"[{stream}] bounds: MXU-only {mxu_ms:5.1f} ms | "
              f"xla-traffic/278GBps {xla_b/HBM_GBPS/1e6:5.1f} ms | "
              f"ideal-fusion/278GBps {ideal_ms:5.1f} ms | healthy-HBM "
              f"xla-traffic {xla_b/HBM_NOMINAL_GBPS/1e6:5.1f} ms")
    both = report["rgb"]["ms"] + report["flow"]["ms"]
    print(f"[total] rgb+flow per 8-clip batch: {both:5.1f} ms "
          f"(= {8/both*1e3:5.1f} clips/s CNN-only ceiling)")
    print("[note] fusion headroom = xla-traffic - ideal-fusion bounds above;"
          " if measured ms ~= xla-traffic bound, the program is at the"
          " bandwidth roofline and only fusion or healthier HBM move it.")


if __name__ == "__main__":
    main()
