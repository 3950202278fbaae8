"""Warm-pair cost breakdown at production flow geometry.

TUNING.md estimates warm cost as ~60% plumbing (camera apply, gathers,
resizes). This tool times each warm-phase component as its own program at
the exact production shapes (8 clips -> ~1000 pairs at 128x128, warm
group 3) so the round-4 fusion work (VERDICT #1's warm-plumbing item)
optimizes measured numbers, not estimates.

Components (b*m = warm pairs, b*k = key pairs):
  gathers    — i0/i1/u0/v0 takes + the output scatter
  cam_est    — estimate_camera on the key pairs (translation corr + LK)
  cam_apply  — apply_camera on the warm pairs (vmap roll + window warp)
  warm_solve — tvl1_level_pallas 1 warp x warm_iters at d=8
  key_solve  — full pyramid on key pairs
  full       — _pair_flow_uv warm g3 cam=key (what ships)
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tools.flow_bench import timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--warm_group", type=int, default=3)
    args = ap.parse_args()

    from videoquery.core.jaxsetup import setup_jax

    setup_jax()
    from videoquery.kernels.tvl1_pallas import (
        apply_camera, estimate_camera, tvl1_level_pallas,
        tvl1_warped_flow_pallas)
    from videoquery.pipeline.extract import (PRODUCTION_TVL1, _pair_flow_uv,
                                             warm_tvl1_params)
    from videoquery.pipeline.sampling import flow_pair_plan, flow_warm_plan

    b = args.batch
    f, fh, fw = 150, 128, 128
    rng = np.random.default_rng(0)
    base = rng.random((b, f + 1, fh, fw), np.float32)
    for ax in (2, 3):
        base = (np.roll(base, 1, ax) + base + np.roll(base, -1, ax)) / 3.0
    gray = jnp.asarray(base[:, :f])

    pair_idx, _ = flow_pair_plan(f, 25, 5)
    kp, wp_, ws = flow_warm_plan(pair_idx, args.warm_group)
    warm = (jnp.asarray(kp), jnp.asarray(wp_), jnp.asarray(ws))
    p = PRODUCTION_TVL1
    pidx = jnp.asarray(pair_idx)
    n_pairs, k, m = len(pair_idx), len(kp), len(wp_)
    print(f"batch={b}: {n_pairs} pairs/clip-batch = {b * n_pairs} total "
          f"({b * k} key + {b * m} warm)")

    # ---- full shipping path ------------------------------------------------
    fn = jax.jit(_pair_flow_uv,
                 static_argnames=("warped", "tvl1", "warm_camera"))
    t_full, _ = timeit(fn, gray, pidx, True, p, warm, warm_camera="key",
                       reps=args.reps)
    t_cold, _ = timeit(fn, gray, pidx, True, p, None, reps=args.reps)

    # ---- components --------------------------------------------------------
    i0k = jnp.reshape(jnp.take(jnp.take(gray, pidx, 1), jnp.asarray(kp), 1),
                      (b * k, fh, fw))
    i1k = jnp.reshape(
        jnp.take(jnp.take(gray, pidx + 1, 1), jnp.asarray(kp), 1),
        (b * k, fh, fw))
    i0w = jnp.reshape(jnp.take(jnp.take(gray, pidx, 1), jnp.asarray(wp_), 1),
                      (b * m, fh, fw))
    i1w = jnp.reshape(
        jnp.take(jnp.take(gray, pidx + 1, 1), jnp.asarray(wp_), 1),
        (b * m, fh, fw))

    @jax.jit
    def gathers(g):
        i0 = jnp.take(g, pidx, axis=1)
        i1 = jnp.take(g, pidx + 1, axis=1)
        i0k_ = jnp.take(i0, jnp.asarray(kp), 1).reshape(b * k, fh, fw)
        i1k_ = jnp.take(i1, jnp.asarray(kp), 1).reshape(b * k, fh, fw)
        uk = i0k_ * 0.1  # stand-in for the key flow [b*k, fh, fw]
        u0 = jnp.take(uk.reshape(b, k, fh, fw), jnp.asarray(ws), 1)
        i0w_ = jnp.take(i0, jnp.asarray(wp_), 1).reshape(b * m, fh, fw)
        i1w_ = jnp.take(i1, jnp.asarray(wp_), 1).reshape(b * m, fh, fw)
        u = jnp.zeros((b, n_pairs, fh, fw), jnp.float32)
        u = u.at[:, jnp.asarray(kp)].set(uk.reshape(b, k, fh, fw))
        u = u.at[:, jnp.asarray(wp_)].set(u0)
        return u.sum() + i0w_.sum() + i1w_.sum() + i0k_.sum() + i1k_.sum()

    t_gather, _ = timeit(gathers, gray, reps=args.reps)

    cam = jax.jit(lambda a, bb: estimate_camera(a, bb, p, None))
    t_camest, A = timeit(cam, i0k, i1k, reps=args.reps)
    ar, ac = A.shape[-2:]  # 2x3 affine or 3x3 homography (round-4 default)
    Aw = jnp.reshape(jnp.take(A.reshape(b, k, ar, ac), jnp.asarray(ws), 1),
                     (b * m, ar, ac))
    t_camapply, i1wc = timeit(jax.jit(apply_camera), i1w, Aw, reps=args.reps)

    u0 = jnp.zeros((b * m, fh, fw), jnp.float32)
    wp = warm_tvl1_params(p)
    t_warmsolve, _ = timeit(tvl1_level_pallas, i0w, i1wc, u0, u0,
                            wp.at_level(0), 8, 4, reps=args.reps)
    t_keysolve, _ = timeit(tvl1_warped_flow_pallas, i0k, i1k, p,
                           max_disp=8, pairs_per_program=4, reps=args.reps)

    rows = [
        ("FULL warm g%d cam=key" % args.warm_group, t_full),
        ("cold (no warm plan)", t_cold),
        ("key solve (cam est+apply+pyramid), %d pairs" % (b * k), t_keysolve),
        ("  cam_est alone (keys)", t_camest),
        ("warm cam_apply (roll + window warp), %d pairs" % (b * m),
         t_camapply),
        ("warm level solve (1 warp x wi%d, d=8)" % (p.warm_iters or 0),
         t_warmsolve),
        ("gathers + scatter (all pairs)", t_gather),
    ]
    for name, sec in rows:
        print(f"  {name:55s} {sec*1e3:8.1f} ms")
    acct = t_keysolve + t_camapply + t_warmsolve + t_gather
    print(f"  => accounted {acct*1e3:.1f} ms vs full {t_full*1e3:.1f} ms; "
          f"warm-side plumbing (cam_apply+gathers) "
          f"{(t_camapply + t_gather)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
