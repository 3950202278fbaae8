"""XLA compiler-flag sweep on the production ensemble forward.

RESULT ON THIS STACK (2026-08-20, axon-tunneled v5e): **the lever does not
exist here.** The local XLA build registers NO `--xla_tpu_*` backend flags
— parse_flags_from_env aborts with "Unknown flag in XLA_FLAGS" for every
TPU scheduling knob tried (scoped-VMEM limit, latency-hiding scheduler,
async-fusion toggles), so the conv-scheduling headroom identified by the
roofline account (docs/TUNING.md: measured forward ~1.7x above the
xla-traffic bound) cannot be reached via compiler flags on this stack.
Baseline re-measured by the sweep: rgb 44.5 ms + flow 48.4 ms = 92.8 ms
per production batch, matching the roofline table. Keep the tool: on a
stack whose libtpu registers these flags (a normal Cloud TPU VM does),
re-running it is the one-command check of whether scheduler knobs recover
any of that 1.7x.

Context: the round-3 roofline account ends with "the remaining 1.7x
between measured and the traffic bound is XLA's conv scheduling at awkward
shapes — real headroom in principle, but every concrete restructuring
available on this stack measured slower." Every *structural* lever (fused
Pallas block, Winograd, int8, dense members) was measured and closed; the
one thing never swept was XLA's own scheduling knobs. This tool A/Bs a set
of TPU backend flags on the exact production forward (200 images x 3
splits per stream, bf16) and, for any winner, on the full fused extraction
step.

XLA_FLAGS must be set before backend init, so each config runs in a child
process; a config whose flags this libtpu build rejects is reported as
"invalid", not a crash. Results print as one JSON line per config plus a
ranked summary.

Run: python tools/xla_flag_bench.py            # sweep the forward
     python tools/xla_flag_bench.py --full     # sweep the fused step
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Each entry: (label, flag string appended to XLA_FLAGS). Candidates are
# the documented TPU backend knobs that plausibly move conv scheduling /
# fusion on a single chip; collective-oriented flags are omitted.
CONFIGS: list[tuple[str, str]] = [
    ("baseline", ""),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("lhs", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("lhs+vmem64m", "--xla_tpu_enable_latency_hiding_scheduler=true "
     "--xla_tpu_scoped_vmem_limit_kib=65536"),
    ("flash-vmem", "--xla_tpu_scoped_vmem_limit_kib=131072"),
]


def child_forward(reps: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from videoquery.nn import bn_inception
    from videoquery.nn.tsn import StreamEnsemble

    out: dict = {}
    for stream, cin in (("rgb", 3), ("flow", 10)):
        ens = StreamEnsemble.random(jax.random.PRNGKey(0), cin,
                                    splits=(1, 2, 3), dtype=jnp.bfloat16)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(200, 224, 224, cin)), jnp.bfloat16)
        fwd = jax.jit(lambda p, xx: jax.vmap(
            lambda q: bn_inception.embed(q, xx))(p))
        o = fwd(ens.stacked_params, x)
        _ = float(o.sum())  # sync; block_until_ready no-ops on this backend
        t0 = time.time()
        for _ in range(reps):
            o = fwd(ens.stacked_params, x)
        _ = float(o.sum())
        out[stream] = (time.time() - t0) / reps * 1e3
    out["total_ms"] = out["rgb"] + out["flow"]
    return out


def child_full(reps: int) -> dict:
    """Time the full production fused _extract_step (bench.py geometry)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from videoquery.core.config import ExtractionConfig
    from videoquery.nn.tsn import TwoStreamTSN
    from videoquery.pipeline.extract import PRODUCTION_TVL1, _extract_step
    from videoquery.pipeline.sampling import (flow_pair_plan, flow_warm_plan,
                                              frame_ticks)

    tsn = TwoStreamTSN.random(jax.random.PRNGKey(0), splits=(1, 2, 3),
                              dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 255, (8, 150, 256, 340, 3),
                                      np.uint8))
    ticks = jnp.asarray(frame_ticks(150, 25, 1) - 1, jnp.int32)
    pair_idx, stack_pos = flow_pair_plan(150, 25, 5)
    cfg = ExtractionConfig()
    kp, wp, ws = flow_warm_plan(pair_idx, cfg.flow_warm_group)
    warm = (jnp.asarray(kp), jnp.asarray(wp), jnp.asarray(ws)) if wp.size \
        else None

    def step():
        return _extract_step(
            tsn.rgb.stacked_params, tsn.flow.stacked_params, frames,
            ticks, jnp.asarray(stack_pos, jnp.int32), 20.0, True,
            PRODUCTION_TVL1, (340, 256), 224, "bfloat16", "pallas", 2,
            flow_pair_idx=jnp.asarray(pair_idx, jnp.int32),
            flow_warm_plan=warm, flow_warm_camera=cfg.flow_warm_camera)

    # step() is a 2-tuple of [K, B, 1024] arrays: sum over the tuple's
    # elements (unpacking each array would split its K axis)
    _ = float(sum(x.sum() for x in step()))
    t0 = time.time()
    outs = [step() for _ in range(reps)]
    _ = float(sum(x.sum() for x in outs[-1]))
    dt = (time.time() - t0) / reps
    return {"total_ms": dt * 1e3, "clips_per_s": 8 / dt}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--full", action="store_true",
                    help="time the full fused extraction step instead of "
                         "the bare ensemble forward")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--configs", nargs="*", default=None,
                    help="subset of config labels to run")
    args = ap.parse_args()

    if args.child:
        from videoquery.core.jaxsetup import setup_jax

        setup_jax()
        res = child_full(args.reps) if args.full else child_forward(args.reps)
        print("RESULT " + json.dumps(res))
        return

    rows = []
    for label, flags in CONFIGS:
        if args.configs and label not in args.configs:
            continue
        env = dict(os.environ)
        base = env.get("XLA_FLAGS", "")
        env["XLA_FLAGS"] = (base + " " + flags).strip()
        cmd = [sys.executable, os.path.abspath(__file__), "--child",
               f"--reps={args.reps}"] + (["--full"] if args.full else [])
        t0 = time.time()
        try:
            proc = subprocess.run(cmd, env=env, capture_output=True,
                                  text=True, timeout=1200)
        except subprocess.TimeoutExpired:
            # a hung config (bad scheduling flag) must not discard the rows
            # already collected — record it and keep sweeping
            print(f"[{label}] FAILED (timeout after 1200s)")
            rows.append((label, flags, None))
            continue
        wall = time.time() - t0
        res = None
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                res = json.loads(line[len("RESULT "):])
        if proc.returncode != 0 or res is None:
            tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
            print(f"[{label}] FAILED (rc={proc.returncode}): "
                  + " | ".join(tail))
            rows.append((label, flags, None))
            continue
        print(f"[{label}] {json.dumps(res)} (wall {wall:.0f}s)")
        rows.append((label, flags, res))

    ok = [(l, f, r) for l, f, r in rows if r]
    ok.sort(key=lambda t: t[2]["total_ms"])
    print("\n=== ranked (fastest first) ===")
    for label, flags, res in ok:
        extra = f" = {res['clips_per_s']:.1f} clips/s" \
            if "clips_per_s" in res else ""
        print(f"{res['total_ms']:8.1f} ms{extra}  {label:14s} {flags}")


if __name__ == "__main__":
    main()
