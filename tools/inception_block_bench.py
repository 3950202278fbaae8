"""On-chip A/B of one BN-Inception block: XLA (unfused) vs the fused Pallas
kernel (tools/inception_pallas.py — demoted out of the package after this
measurement), at production ensemble geometry
(vmap over K stacked members, N images each, bf16).

The round-3 roofline initially concluded the ensemble was compute-bound at
93-100% MFU — but that peak figure was RTT-polluted (few chained
iterations). Long-chain measurement puts this chip's bf16 matmul peak at
~160-175 TFLOP/s and reduction-read bandwidth at ~450 GB/s, which makes
the forward TRAFFIC-bound (achieved ~350 GB/s vs a 37 ms xla-traffic
bound) — exactly the regime the fused block targets (one HBM read + one
write per block instead of 4 reads + every branch materialized).

Run: python tools/inception_block_bench.py --blocks inception_4b
(compile of the Pallas kernel can take many minutes per block shape on
this stack; the persistent compile cache makes repeat runs instant).
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
import numpy as np

from videoquery.nn import bn_inception as bi


def block_geometry():
    """{name: (hw, cin, spec)} walking the post-pool2 chain (28x28, 192ch)."""
    hw, cin = 28, 192
    out = {}
    for name, b in bi.INCEPTION_BLOCKS:
        out[name] = (hw, cin, b)
        if b["stride"] == 1:
            cout = b["c1"] + b["c3"] + b["d2"] + b["pp"]
        else:
            cout = b["c3"] + b["d2"] + cin
        hw //= b["stride"]
        cin = cout
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", nargs="*", default=None,
                    help="default: all stride-1 blocks")
    ap.add_argument("--images", type=int, default=200)
    ap.add_argument("--splits", type=int, default=3)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--skip_xla", action="store_true")
    ap.add_argument("--skip_pallas", action="store_true")
    args = ap.parse_args()

    from tools.inception_pallas import fused_inception

    geo = block_geometry()
    names = args.blocks or [n for n, (_h, _c, b) in geo.items()
                            if b["stride"] == 1]
    rng = np.random.default_rng(0)
    dt = jnp.dtype(args.dtype)
    base = jax.tree.map(jnp.asarray, bi.init_params(0, 3))
    k = args.splits

    for name in names:
        hw, cin, spec = geo[name]
        p = {key: {"w": jnp.stack([v["w"].astype(dt)] * k),
                   "b": jnp.stack([v["b"]] * k)}
             for key, v in base.items() if key.startswith(name + "/")}
        # block inputs are ReLU outputs (>= 0) — the fused MAX pool's
        # zero-padding identity relies on it
        x = jnp.asarray(np.abs(rng.normal(size=(args.images, hw, hw, cin)))
                        * 0.3, dt)

        variants = []
        if not args.skip_xla:
            variants.append(("xla   ", jax.jit(lambda pp: jax.vmap(
                lambda q: bi._inception(q, name, spec, x))(pp))))
        if not args.skip_pallas:
            variants.append(("pallas", jax.jit(lambda pp: jax.vmap(
                lambda q: fused_inception(q, name, spec, x,
                                          group=args.group))(pp))))
        for label, f in variants:
            t0 = time.time()
            out = f(p)
            _ = float(out.sum())  # forced sync: block_until_ready no-ops here
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(args.reps):
                out = f(p)
            _ = float(out.sum())
            ms = (time.time() - t0) / args.reps * 1e3
            # analytic traffic at the xla model (4 branch reads) vs fused
            n = args.images * k
            xbytes = n * hw * hw * cin * 2
            print(f"{name} {label}: {ms:7.2f} ms  "
                  f"(compile+first {compile_s:5.1f} s; input tile "
                  f"{xbytes/1e6:.0f} MB x4-reads unfused)", flush=True)


if __name__ == "__main__":
    main()
