"""Flow quality harness: does the production flow config change retrieval?

Generates a synthetic corpus of clips with distinct motion signatures
(different object velocities + camera pans over textured backgrounds),
extracts two-stream embeddings under (a) the reference-style flow — XLA
gather-warp TV-L1 at full resolution, the faithful baseline implementation —
and (b) the production Pallas config (half-res, window warp, fine-warp
schedule), then compares per-clip embedding cosines and retrieval rankings.

Run: python tools/flow_quality.py  (uses the real TPU; ~2-4 min)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


MOTION_CLASSES = [  # (object velocity, camera pan) — strongly distinct
    ((4.0, 0.0), (0.0, 0.0)),    # fast right
    ((-4.0, 0.0), (0.0, 0.0)),   # fast left
    ((0.0, 3.0), (0.0, 0.0)),    # down
    ((0.0, -3.0), (0.0, 0.0)),   # up
    ((0.0, 0.0), (0.0, 0.0)),    # static
    ((2.5, 2.5), (1.5, 0.0)),    # diagonal + pan (tests compensation)
    ((12.0, 0.0), (0.0, 0.0)),   # very fast right: >10 px/frame foreground,
                                 # near the reference's ±20 px quantization
                                 # bound (build_wof_clips.py:70-73)
    ((-7.0, 5.0), (2.0, 0.0)),   # fast diagonal + pan. NOTE: the object
                                 # motion must be UNIQUE per class — with
                                 # accurate camera compensation the pan is
                                 # (correctly) erased, so a pan class whose
                                 # object motion matches another class's
                                 # direction collapses onto it and the
                                 # metric punishes good compensation
    ((3.0, -3.0), "zoom"),       # camera zoom-in + diagonal object: tests
                                 # the parametric (LK) compensation — the
                                 # TV-flow-affine-fit estimator left zooms
                                 # uncompensated
]
ZOOM_PER_FRAME = 0.004           # 0.4%/frame zoom-in


def make_corpus(frames=30, h=128, w=176, seed=0, scale=1):
    """Two clips per motion class (different textures/objects, same motion):
    the retrieval metric is whether each clip's nearest flow-neighbor is its
    motion partner. scale multiplies resolution, object size AND velocities
    (proportional motion at production-like frame sizes)."""
    import cv2

    rng = np.random.default_rng(seed)
    h, w, osz = h * scale, w * scale, 28 * scale
    clips, labels = [], []
    for ci, (obj_v, pan) in enumerate(MOTION_CLASSES):
        for rep in range(2):
            base = rng.integers(0, 255, (h * 2, w * 2, 3), np.uint8)
            k = 11 * scale + (1 - (11 * scale) % 2)  # odd kernel size
            base = cv2.GaussianBlur(base, (k, k), 3 * scale)
            obj = rng.integers(0, 255, (osz, osz, 3), np.uint8)
            obj_xy = np.array([w * 0.25, h * 0.25]) + rng.uniform(0, 15 * scale, 2)
            fr = []
            for t in range(frames):
                if pan == "zoom":
                    # camera zoom-in about the window center
                    s = 1.0 + ZOOM_PER_FRAME * t
                    ch, cw = int(round(h / s)), int(round(w / s))
                    y0 = (h * 2 - ch) // 2
                    x0 = (w * 2 - cw) // 2
                    f = cv2.resize(base[y0:y0 + ch, x0:x0 + cw], (w, h))
                else:
                    ox = int(t * pan[0] * scale) % w
                    oy = int(t * pan[1] * scale) % h
                    f = base[oy:oy + h, ox:ox + w].copy()
                px = int(obj_xy[0] + t * obj_v[0] * scale) % (w - osz)
                py = int(obj_xy[1] + t * obj_v[1] * scale) % (h - osz)
                f[py:py + osz, px:px + osz] = obj
                fr.append(f)
            clips.append(np.stack(fr))
            labels.append(ci)
    return np.stack(clips), np.asarray(labels)  # [C, F, H, W, 3], [C]


def extract(clips, flow_impl, tvl1, flow_res_div, tsn):
    import jax.numpy as jnp

    from videoquery.pipeline.extract import _extract_step
    from videoquery.pipeline.sampling import frame_ticks

    c, f = clips.shape[:2]
    from videoquery.pipeline.sampling import flow_stack_index_matrix

    ticks = jnp.asarray(frame_ticks(f, 9, 1) - 1, jnp.int32)
    sidx = jnp.asarray(flow_stack_index_matrix(f, 9, 5), jnp.int32)
    rgb, flow = _extract_step(
        tsn.rgb.stacked_params, tsn.flow.stacked_params,
        jnp.asarray(clips), ticks, sidx, 20.0, True, tvl1,
        (340, 256), 224, "float32", flow_impl, flow_res_div,
    )
    return np.asarray(rgb, np.float64), np.asarray(flow, np.float64)


def cosine(a, b):
    return (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                              * np.linalg.norm(b, axis=-1) + 1e-12)


def ranking(emb):  # [K, C, D] -> per-clip neighbor order by mean-split cosine
    e = emb.mean(axis=0)
    sims = cosine(e[:, None], e[None, :])
    return np.argsort(-sims, axis=1)


def partner_accuracy(emb, labels):
    """Fraction of clips whose nearest flow-neighbor shares their motion
    class (each class has exactly one partner)."""
    e = emb.mean(axis=0)
    sims = cosine(e[:, None], e[None, :])
    np.fill_diagonal(sims, -np.inf)
    nn = sims.argmax(axis=1)
    return float((labels[nn] == labels).mean())


def main():
    import jax

    from videoquery.kernels.tvl1 import TVL1Params
    from videoquery.nn.tsn import TwoStreamTSN

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", action="store_true",
                    help="also sweep reduced-iteration candidate configs")
    ap.add_argument("--seeds", type=int, nargs="+", default=[0],
                    help="corpus seeds; accuracy averages across them")
    ap.add_argument("--scale", type=int, default=1,
                    help="corpus resolution/motion multiplier (2 =~ the "
                         "production 256x340 decode geometry)")
    ap.add_argument("--res_sweep", action="store_true",
                    help="sweep flow_res_div at the production schedule "
                         "instead of the schedule sweep")
    args = ap.parse_args()

    tsn = TwoStreamTSN.random(jax.random.PRNGKey(0), splits=(1,))
    configs = {
        "baseline (xla full-res s5w5i30)": ("xla", TVL1Params(), 1),
        "pallas full-res": ("pallas", TVL1Params(fine_warps=2), 1),
        "pallas half-res (production)": (
            "pallas", TVL1Params(fine_warps=2, n_iters=20, fine_iters=15), 2),
        "pallas quarter-res": ("pallas", TVL1Params(fine_warps=2), 4),
    }
    if args.res_sweep:
        # no XLA full-res baseline here: at --scale 2 that program faults
        # the TPU worker (full-res gather-warp over 16x30 256x352 frames);
        # partner accuracy across res_divs is the decision metric
        prod = TVL1Params(n_scales=4, n_warps=3, fine_warps=2, n_iters=20,
                          fine_iters=10)
        import dataclasses as _dc

        gw = _dc.replace(prod, grad_source="warped")
        configs = {
            "prod sched div2": ("pallas", prod, 2),
            "prod div2 grad=warped": ("pallas", gw, 2),
            "prod gw coarse 48x64": (
                "pallas", _dc.replace(gw, coarse_hw=(48, 64)), 2),
            "prod gw coarse 32x48": (
                "pallas", _dc.replace(gw, coarse_hw=(32, 48)), 2),
            "prod sched div3": ("pallas", prod, 3),
            "prod sched div4": ("pallas", prod, 4),
        }
    if args.sweep:
        configs.update({
            "half-res s5w5i30 (conservative)": (
                "pallas", TVL1Params(fine_warps=2), 2),
            "half-res s4 i20 fi15": (
                "pallas", TVL1Params(n_scales=4, fine_warps=2, n_iters=20,
                                     fine_iters=15), 2),
            "half-res w3 i20 fi10": (
                "pallas", TVL1Params(n_warps=3, fine_warps=2, n_iters=20,
                                     fine_iters=10), 2),
            "half-res s4 w3 i20 fi10": (
                "pallas", TVL1Params(n_scales=4, n_warps=3, fine_warps=2,
                                     n_iters=20, fine_iters=10), 2),
            "half-res full-window (no separable)": (
                "pallas", TVL1Params(fine_warps=2, separable_warp=False), 2),
        })
    accs = {name: [] for name in configs}
    results = {}
    for seed in args.seeds:
        clips, labels = make_corpus(seed=seed, scale=args.scale)
        for name, (impl, tvl1, div) in configs.items():
            t0 = time.time()
            rgb, flow = extract(clips, impl, tvl1, div, tsn)
            if seed == args.seeds[0]:
                results[name] = (rgb, flow)
            acc = partner_accuracy(flow, labels)
            accs[name].append(acc)
            print(f"[{time.time()-t0:6.1f}s] seed {seed} {name:36s} "
                  f"motion-partner retrieval accuracy: {acc:.2f}", flush=True)
    if len(args.seeds) > 1:
        print("-- mean accuracy over seeds", args.seeds)
        for name, a in accs.items():
            print(f"{name:40s} {np.mean(a):.3f}  (per-seed {a})")

    if "baseline (xla full-res s5w5i30)" not in results:
        return
    base_rgb, base_flow = results.pop("baseline (xla full-res s5w5i30)")
    for name, (rgb, flow) in results.items():
        cos = cosine(flow.reshape(-1, flow.shape[-1]),
                     base_flow.reshape(-1, base_flow.shape[-1]))
        print(f"{name:40s} flow-emb cosine vs baseline: "
              f"median {np.median(cos):.4f} min {cos.min():.4f}")
    rgb0 = next(iter(results.values()))[0]
    print("rgb stream max |diff| across configs:",
          float(np.abs(rgb0 - base_rgb).max()))


if __name__ == "__main__":
    main()
