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
    # Replicate the TSN params ONCE, like the production Extractor. Leaving
    # them uncommitted makes every step re-place them onto all N devices —
    # that per-call transfer grows with the device count and was the bulk
    # of the round-4 "27% strong-scaling loss" (SCALING_r05 diagnosis).
    repl = NamedSharding(mesh, P())
    rgb_p = jax.device_put(tsn.rgb.stacked_params, repl)
    flow_p = jax.device_put(tsn.flow.stacked_params, repl)
    ticks = jnp.asarray(frame_ticks(frames, 5, 1) - 1, jnp.int32)
    from videoquery.pipeline.sampling import flow_stack_index_matrix

    sidx = jnp.asarray(flow_stack_index_matrix(frames, 5, 5), jnp.int32)

    def step():
        r, f = _extract_step(
            rgb_p, flow_p, frames_dev,
            ticks, sidx, 20.0, True, tvl1, (340, 256), 224, "float32",
            "xla", 2, mesh=mesh)
        return float(np.asarray(r).sum())

    step()  # compile
    t0 = time.time()
    for _ in range(reps):
        step()
    dt = (time.time() - t0) / reps
    return {"devices": n_devices, "seconds": round(dt, 3)}


def diagnose(n_devices: int, batch_clips: int, frames: int, hw, reps: int
             ) -> dict:
    """Decompose the strong-scaling loss (VERDICT r4 weak #4): per-phase
    timings of the sharded step, the collective-op count of its compiled
    HLO (linear batch parallelism must need NONE), and a pure elementwise
    CONTROL program of the same batch shape — any slowdown the control
    shows under sharding is virtual-mesh overhead (one host core executing
    N per-shard programs serially, each with worse vectorization and its
    own dispatch), not a property of the extraction program."""
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={n_devices}").strip()
    import re

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from videoquery.core.meshes import DATA_AXIS, make_mesh
    from videoquery.kernels.tvl1 import TVL1Params
    from videoquery.nn.tsn import TwoStreamTSN
    from videoquery.pipeline.extract import _ensemble_embed, _extract_step
    from videoquery.pipeline.preprocess import preprocess_rgb
    from videoquery.pipeline.sampling import (flow_stack_index_matrix,
                                              frame_ticks)

    assert len(jax.devices()) == n_devices
    mesh = make_mesh(model_parallel=1)
    h, w = hw
    tsn = TwoStreamTSN.random(jax.random.PRNGKey(0), splits=(1,))
    tvl1 = TVL1Params(n_scales=3, n_warps=2, n_iters=8)
    rng = np.random.default_rng(0)
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    frames_np = rng.integers(0, 255, (batch_clips, frames, h, w, 3), np.uint8)
    frames_dev = jax.device_put(jnp.asarray(frames_np), sharding)
    ticks = jnp.asarray(frame_ticks(frames, 5, 1) - 1, jnp.int32)
    sidx = jnp.asarray(flow_stack_index_matrix(frames, 5, 5), jnp.int32)

    def timeit(fn):
        fn()
        t0 = time.time()
        for _ in range(reps):
            fn()
        return (time.time() - t0) / reps

    out = {"devices": n_devices}

    # full step + its collective count
    full = jax.jit(lambda f: _extract_step(
        tsn.rgb.stacked_params, tsn.flow.stacked_params, f,
        ticks, sidx, 20.0, True, tvl1, (340, 256), 224, "float32",
        "xla", 2, mesh=mesh))
    compiled = full.lower(frames_dev).compile()
    hlo = compiled.as_text()
    out["collective_ops"] = len(re.findall(
        r"all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all",
        hlo))
    out["full_s"] = round(timeit(
        lambda: float(np.asarray(full(frames_dev)[0]).sum())), 3)

    # phase: CNN ensemble alone on sharded tick frames
    tick_frames = jax.device_put(
        jnp.asarray(frames_np[:, np.asarray(ticks)]), sharding)

    @jax.jit
    def cnn_only(tf):
        x = preprocess_rgb(tf.reshape((-1,) + tf.shape[2:]).astype(jnp.float32)
                           / 255.0, (340, 256), 224, dtype=jnp.float32)
        return _ensemble_embed(tsn.rgb.stacked_params, x, mesh)

    out["cnn_s"] = round(timeit(
        lambda: float(np.asarray(cnn_only(tick_frames)).sum())), 3)

    # phase: flow alone (gray frames, sharded on batch; the XLA solver —
    # same impl the full step above runs on this CPU mesh)
    from videoquery.kernels.tvl1 import tvl1_warped_flow

    gray = jax.device_put(
        jnp.asarray(frames_np.mean(-1, dtype=np.float32) / 255.0), sharding)

    @jax.jit
    def flow_only(g):
        i0 = g[:, :-1].reshape(-1, h, w)
        i1 = g[:, 1:].reshape(-1, h, w)
        u, _ = tvl1_warped_flow(i0, i1, tvl1)
        return u

    out["flow_s"] = round(timeit(
        lambda: float(np.asarray(flow_only(gray)).sum())), 3)

    # CONTROL: pure elementwise chain, batch-sharded, zero communication
    big = jax.device_put(
        jnp.asarray(rng.standard_normal(
            (batch_clips, 4 * frames * h * w // 64, 64)).astype(np.float32)),
        sharding)

    @jax.jit
    def control(x):
        for _ in range(30):
            x = jnp.tanh(x) * 1.0001 + 0.0001
        return x

    out["control_s"] = round(timeit(
        lambda: float(np.asarray(control(big)).ravel()[0])), 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=0,
                    help="child mode: measure one device count")
    ap.add_argument("--diag", action="store_true",
                    help="decompose the scaling loss: per-phase timings, "
                         "HLO collective count, elementwise control")
    ap.add_argument("--batch_clips", type=int, default=8)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--hw", type=int, nargs=2, default=(96, 128))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="SCALING_r03.json")
    args = ap.parse_args()

    if args.devices:
        fn = diagnose if args.diag else measure
        print(json.dumps(fn(args.devices, args.batch_clips, args.frames,
                            tuple(args.hw), args.reps)))
        return

    rows = []
    for n in (1, 2, 4, 8):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--devices", str(n), "--batch_clips", str(args.batch_clips),
               "--frames", str(args.frames), "--hw", str(args.hw[0]),
               str(args.hw[1]), "--reps", str(args.reps)] \
            + (["--diag"] if args.diag else [])
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
        key = "full_s" if args.diag else "seconds"
        t1 = rows[0][key]
        eff = t1 / row[key]
        row["efficiency_vs_1dev"] = round(eff, 3)
        print(f"data axis = {n}: {row[key]:.3f} s/step  "
              f"(strong-scaling efficiency {eff:.3f})"
              + (f"  phases {row}" if args.diag else ""), flush=True)

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
