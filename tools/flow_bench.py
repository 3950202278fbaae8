"""Micro-benchmark for the TV-L1 flow path at production geometry.

Breaks the warped-flow cost into stages (camera pass / affine warp / each
pyramid level) and sweeps pairs-per-program so kernel changes can be
evaluated in seconds instead of via the full extraction bench.

Usage:
  python tools/flow_bench.py [--pairs 500] [--hw 128 128] [--sweep 4 8 16 32]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from videoquery.kernels.tvl1 import TVL1Params, _pyramid_shapes


def sync(x):
    """Force device sync via tiny readback (block_until_ready is a no-op on
    the tunneled backend)."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[0]))


def timeit(fn, *args, reps=10, **kw):
    """Queue `reps` async calls and sync once: the tunnel's ~35 ms readback
    RTT amortizes across reps instead of polluting every sample."""
    out = fn(*args, **kw)
    sync(out)
    t0 = time.perf_counter()
    outs = [fn(*args, **kw) for _ in range(reps)]
    sync(outs[-1])
    return (time.perf_counter() - t0) / reps, out


def make_inputs(n, h, w, seed=0):
    """Synthetic 'video-like' pairs: smooth random texture + shifted copy +
    noise (TV-L1 iteration behavior on pure noise is unrepresentative)."""
    rng = np.random.RandomState(seed)
    base = rng.rand(n, h + 16, w + 16).astype(np.float32)
    # smooth with a little box filtering
    for ax in (1, 2):
        base = (np.roll(base, 1, ax) + base + np.roll(base, -1, ax)) / 3.0
    i0 = base[:, 8:8 + h, 8:8 + w]
    i1 = base[:, 6:6 + h, 9:9 + w]  # global shift (2, -1)
    i1 = i1 + rng.rand(n, h, w).astype(np.float32) * 0.01
    return jnp.asarray(i0), jnp.asarray(i1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=500)
    ap.add_argument("--hw", type=int, nargs=2, default=[128, 128])
    ap.add_argument("--sweep", type=int, nargs="+", default=[4, 8, 16, 32])
    ap.add_argument("--levels", action="store_true", help="per-level timing")
    ap.add_argument("--warm", action="store_true",
                    help="time the temporal warm-start two-phase path "
                         "(groups 3/5) against cold at the production "
                         "schedule")
    args = ap.parse_args()

    from videoquery.core.jaxsetup import setup_jax
    setup_jax()
    from videoquery.kernels.tvl1_pallas import (
        tvl1_flow_pallas, tvl1_warped_flow_pallas, tvl1_level_pallas)
    from videoquery.pipeline.extract import PRODUCTION_TVL1

    n = args.pairs
    h, w = args.hw
    i0, i1 = make_inputs(n, h, w)
    p = PRODUCTION_TVL1

    if args.warm:
        import jax.numpy as jnp2

        from videoquery.core.config import ExtractionConfig
        from videoquery.pipeline.extract import _pair_flow_uv
        from videoquery.pipeline.sampling import flow_warm_plan

        # consecutive-pair "video": gray[t+1] = gray[t] pairs, the real
        # temporal structure the warm start exploits
        gray = jnp.concatenate([i0[:1], i1], axis=0)[None]  # [1, n+1, h, w]
        pair_idx = np.arange(n, dtype=np.int32)
        # bench exactly what ships: production flow_warm_camera ("key"
        # reuses the keyframe's LK camera fit for warm pairs)
        warm_camera = ExtractionConfig().flow_warm_camera
        fn = jax.jit(_pair_flow_uv,
                     static_argnames=("warped", "tvl1", "warm_camera"))
        for wg in (0, 5, 3):
            plan = None
            if wg:
                kp, wp_, ws = flow_warm_plan(pair_idx, wg)
                plan = (jnp.asarray(kp), jnp.asarray(wp_), jnp.asarray(ws))
            dt, _ = timeit(fn, gray, jnp.asarray(pair_idx), True, p, plan,
                           warm_camera=warm_camera)
            label = f"warm g{wg} cam={warm_camera}" if wg else "cold    "
            print(f"warped prod {label}: {dt*1e3:8.1f} ms for {n} pairs "
                  f"({n/dt:8.1f} pairs/s)")
        return

    print(f"== geometry: {n} pairs @ {h}x{w}, params {p.n_scales}s/"
          f"{p.n_warps}w/{p.n_iters}i fine_warps={p.fine_warps}")

    for g in args.sweep:
        try:
            dt, _ = timeit(tvl1_warped_flow_pallas, i0, i1, p,
                           max_disp=8, pairs_per_program=g)
            print(f"warped_flow  G={g:3d}: {dt*1e3:8.1f} ms "
                  f"({n/dt:8.1f} pairs/s)")
        except Exception as e:  # noqa: BLE001
            print(f"warped_flow  G={g:3d}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}")

    for g in args.sweep:
        try:
            dt, _ = timeit(tvl1_flow_pallas, i0, i1, p,
                           max_disp=8, pairs_per_program=g)
            print(f"plain_flow   G={g:3d}: {dt*1e3:8.1f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"plain_flow   G={g:3d}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}")

    if args.levels:
        shapes = _pyramid_shapes(h, w, p)
        for g in args.sweep:
            print(f"-- per-level, G={g}")
            for i, (lh, lw) in enumerate(shapes):
                li0 = jax.image.resize(i0, (n, lh, lw), method="linear")
                li1 = jax.image.resize(i1, (n, lh, lw), method="linear")
                u = jnp.zeros((n, lh, lw), jnp.float32)
                d = max(2, round(8 * p.scale_step ** i))
                import dataclasses
                pl_ = dataclasses.replace(p, n_warps=p.warps_at_level(i))
                try:
                    dt, _ = timeit(tvl1_level_pallas, li0, li1, u, u, pl_,
                                   d, g)
                    print(f"  level {i} ({lh}x{lw}, d={d}, "
                          f"warps={pl_.n_warps}): {dt*1e3:8.1f} ms")
                except Exception as e:  # noqa: BLE001
                    print(f"  level {i} ({lh}x{lw}, d={d}): FAIL "
                          f"{type(e).__name__}: {str(e)[:100]}")


if __name__ == "__main__":
    main()
