"""Measured multi-device extraction scaling (VERDICT r2 #5).

PARITY.md's multi-chip story ("throughput scales linearly over the data
mesh axis") was asserted but never measured. This tool measures it as far
as this environment allows: a STRONG-scaling run of the production
`_extract_step` program sharded over the data axis of a virtual CPU mesh
(1/2/4/8 devices, same total clip batch). All virtual devices timeshare
the same host core, so ideal scaling keeps wall time CONSTANT as the device
count grows; any sharding-induced cost (collectives, halo transfers,
padding, per-shard recompute) shows up as time growth. Relative efficiency
t(1)/t(N) is the number PARITY.md's projection table uses.

This is a program-structure measurement, not a hardware measurement — it
proves the SPMD extraction program adds no serialization or communication
blowup when sharded, which is the half of the linear-scaling claim that is
checkable without a pod. (The absolute per-chip rate comes from bench.py on
the real chip.)

Run:  python tools/scaling_curve.py            # drives 1/2/4/8 subprocesses
      python tools/scaling_curve.py --devices 4  # one measurement (child)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n_devices: int, batch_clips: int, frames: int, hw, reps: int
            ) -> dict:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={n_devices}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from videoquery.core.meshes import DATA_AXIS, make_mesh
    from videoquery.kernels.tvl1 import TVL1Params
    from videoquery.nn.tsn import TwoStreamTSN
    from videoquery.pipeline.extract import _extract_step
    from videoquery.pipeline.sampling import frame_ticks

    assert len(jax.devices()) == n_devices
    mesh = make_mesh(model_parallel=1)
    h, w = hw
    tsn = TwoStreamTSN.random(jax.random.PRNGKey(0), splits=(1,))
    # modest schedule: the scaling structure is identical at any depth, and
    # the CPU mesh pays the full cost serially
    tvl1 = TVL1Params(n_scales=3, n_warps=2, n_iters=8)
    rng = np.random.default_rng(0)
    frames_np = rng.integers(0, 255, (batch_clips, frames, h, w, 3), np.uint8)
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    frames_dev = jax.device_put(jnp.asarray(frames_np), sharding)
    ticks = jnp.asarray(frame_ticks(frames, 5, 1) - 1, jnp.int32)
    from videoquery.pipeline.sampling import flow_stack_index_matrix

    sidx = jnp.asarray(flow_stack_index_matrix(frames, 5, 5), jnp.int32)

    def step():
        r, f = _extract_step(
            tsn.rgb.stacked_params, tsn.flow.stacked_params, frames_dev,
            ticks, sidx, 20.0, True, tvl1, (340, 256), 224, "float32",
            "xla", 2, mesh=mesh)
        return float(np.asarray(r).sum())

    step()  # compile
    t0 = time.time()
    for _ in range(reps):
        step()
    dt = (time.time() - t0) / reps
    return {"devices": n_devices, "seconds": round(dt, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="child mode: measure one device count")
    ap.add_argument("--batch_clips", type=int, default=8)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--hw", type=int, nargs=2, default=(96, 128))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="SCALING_r03.json")
    args = ap.parse_args()

    if args.devices:
        print(json.dumps(measure(args.devices, args.batch_clips, args.frames,
                                 tuple(args.hw), args.reps)))
        return

    rows = []
    for n in (1, 2, 4, 8):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--devices", str(n), "--batch_clips", str(args.batch_clips),
               "--frames", str(args.frames), "--hw", str(args.hw[0]),
               str(args.hw[1]), "--reps", str(args.reps)]
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out = subprocess.run(cmd, capture_output=True, text=True, env=env,
                             cwd=os.path.dirname(os.path.dirname(
                                 os.path.abspath(__file__))))
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"devices={n} FAILED:\n{out.stderr[-2000:]}")
            sys.exit(1)
        row = json.loads(line[-1])
        rows.append(row)
        t1 = rows[0]["seconds"]
        eff = t1 / row["seconds"]
        row["efficiency_vs_1dev"] = round(eff, 3)
        print(f"data axis = {n}: {row['seconds']:.3f} s/step  "
              f"(strong-scaling efficiency {eff:.3f})", flush=True)

    result = {
        "mode": "strong-scaling on a single-core virtual CPU mesh "
                "(constant total batch; ideal = constant wall time)",
        "batch_clips": args.batch_clips,
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
