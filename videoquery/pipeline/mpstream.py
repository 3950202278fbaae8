"""Multi-core streaming producer: N decode worker PROCESSES feed one
device dispatcher.

The reference parallelized decode with a multiprocessing.Pool over videos
(build_wof_clips.py:175-184) but ran its compute stage afterwards; here
the workers stream compact upload payloads (pipeline.payload.
stream_payloads: decode at target scale + cv2 gray + tick crop/yuv,
constant memory per worker) over a bounded queue into the single process
that owns the TPU, which uploads and dispatches fused extraction batches
as they arrive. End-to-end approaches max(aggregate decode, upload,
device): the single-threaded producer ceiling (~20 clips/s/core at the
bench codec) scales with cores — demonstrated with throttled synthetic
producers in tests/test_mpstream.py (this 1-core bench host cannot show
real-decode scaling; docs/TUNING.md).

Workers are `spawn`ed (not forked): the parent holds a live TPU client
whose grpc state must not be duplicated into children; workers never
touch jax. Spawn costs ~5-10 s per worker on hosts whose sitecustomize
preloads jax into every interpreter — WorkerPool amortizes that by
keeping the fleet alive across extract_videos_mp calls (persistent-pool
reuse measured in bench.py's mp row)."""

from __future__ import annotations

import importlib
import logging
import multiprocessing as mp
import os
import queue
import traceback
from typing import Callable, Sequence

from videoquery.core.config import ExtractionConfig

log = logging.getLogger(__name__)

DEFAULT_PAYLOAD_FN = "videoquery.pipeline.payload:stream_payloads"


def _resolve(spec: str) -> Callable:
    mod, _, name = spec.partition(":")
    return getattr(importlib.import_module(mod), name)


def _worker(task_q, out_q, cfg: ExtractionConfig, flow_res_div: int,
            new_size, payload_spec: str) -> None:
    """Decode worker: pull (call_id, vi, path) tasks, stream payloads to
    the dispatcher. Top-level function (spawn-picklable); jax-free — the
    payload module keeps the worker's import cost to numpy + cv2. Runs
    until the None shutdown sentinel (a persistent pool keeps it alive
    across calls)."""
    payload_fn = _resolve(payload_spec)
    pid = os.getpid()
    while True:
        item = task_q.get()
        if item is None:
            return
        call_id, vi, path = item
        # claim first: if this process dies mid-video (cv2 segfault), the
        # dispatcher knows WHICH video to fail instead of waiting forever
        out_q.put((call_id, "start", vi, pid))
        try:
            for payload in payload_fn(path, cfg, flow_res_div, new_size):
                out_q.put((call_id, "payload", vi, payload))
            out_q.put((call_id, "done", vi, None))
        except Exception:
            out_q.put((call_id, "error", vi,
                       f"{path}: {traceback.format_exc()}"))


class WorkerPool:
    """Persistent decode-worker fleet, reusable across extract calls.

    Spawn startup (~5-10 s/worker where sitecustomize preloads jax) is
    paid once; subsequent calls stream at steady state. The pool is bound
    to one (cfg, flow_res_div, new_size, payload_fn) configuration — a
    call with a different configuration restarts the fleet."""

    def __init__(self, workers: int, cfg: ExtractionConfig,
                 flow_res_div: int, new_size,
                 payload_spec: str = DEFAULT_PAYLOAD_FN,
                 queue_window: int = 4):
        self.workers = workers
        self.key = (repr(cfg), flow_res_div, tuple(new_size or ()),
                    payload_spec)
        ctx = mp.get_context("spawn")
        self.task_q = ctx.Queue()
        # bounded: backpressure a fast decode fleet against a slow device
        # or tunnel (each payload is ~5 MB/clip at production settings)
        self.out_q = ctx.Queue(maxsize=max(2, queue_window))
        self.procs = [
            ctx.Process(target=_worker,
                        args=(self.task_q, self.out_q, cfg, flow_res_div,
                              new_size, payload_spec),
                        daemon=True)
            for _ in range(workers)
        ]
        for p in self.procs:
            p.start()
        self._call_id = 0

    def alive(self) -> bool:
        return any(p.is_alive() for p in self.procs)

    def next_call(self) -> int:
        self._call_id += 1
        return self._call_id

    def shutdown(self, timeout: float = 30.0) -> None:
        for _ in self.procs:
            self.task_q.put(None)
        for p in self.procs:
            p.join(timeout=timeout)
            if p.is_alive():
                p.terminate()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()


def stream_dispatch(pool: WorkerPool, paths: Sequence[str],
                    dispatch: Callable) -> tuple[dict, list]:
    """Feed paths to the pool, apply `dispatch` to every payload in arrival
    order, return ({vi: [dispatch results]}, errors). The dispatcher loop
    never blocks forever: a worker that dies without reporting (segfault/
    OOM-kill in cv2 on a malformed video) is detected by liveness polling
    and its unfinished videos are failed instead of hanging the caller."""
    call_id = pool.next_call()
    for vi, path in enumerate(paths):
        pool.task_q.put((call_id, vi, path))
    results: dict[int, list] = {i: [] for i in range(len(paths))}
    done: set[int] = set()
    claimed: dict[int, int] = {}  # vi -> worker pid
    errors: list[str] = []

    def fail(vi, why):
        done.add(vi)
        errors.append(f"{paths[vi]}: {why}")
        log.error("extraction worker died mid-video: %s (%s)",
                  paths[vi], why)

    def handle(msg_call, kind, vi, obj):
        if msg_call != call_id:
            return  # straggler from an abandoned earlier call
        if kind == "start":
            claimed[vi] = obj
        elif kind == "payload":
            results[vi].append(dispatch(obj))
        elif kind == "done":
            done.add(vi)
        else:  # error
            done.add(vi)
            errors.append(obj)
            log.error("extraction worker failed: %s", obj)

    while len(done) < len(paths):
        try:
            handle(*pool.out_q.get(timeout=5.0))
            continue
        except queue.Empty:
            pass
        # Dead-worker sweep: a worker that exited without 'done'-ing its
        # claimed video died silently (segfault/OOM-kill in cv2); fail
        # that video rather than waiting forever. Drain stragglers first
        # so a 'done' racing the exit is not miscounted as a death.
        try:
            while True:
                handle(*pool.out_q.get_nowait())
        except queue.Empty:
            pass
        dead = {p.pid for p in pool.procs if p.exitcode is not None}
        for vi, pid in list(claimed.items()):
            if vi not in done and pid in dead:
                fail(vi, "decode worker died without reporting "
                         f"(pid {pid})")
        if pool.alive():
            continue  # live workers will pick up any unclaimed tasks
        # Every worker has exited: unclaimed tasks can never run.
        for vi in range(len(paths)):
            if vi not in done:
                fail(vi, "no live decode workers left (exitcodes: "
                         f"{[p.exitcode for p in pool.procs]})")
    return results, errors


def extract_videos_mp(extractor, paths: Sequence[str], workers: int = 0,
                      new_size=None, window_batches: int = 4,
                      pool: WorkerPool | None = None):
    """Extract signatures for many videos with a multi-process producer.

    Returns {path: [ClipSignatures]} (each video's batches sorted by clip
    number, embeddings downloaded in one readback per video). Raises
    RuntimeError listing every failed video AFTER the rest completed
    (a decode failure must not silently truncate the batch job — parity
    with extract_video's raise). Pass a WorkerPool to amortize worker
    spawn across calls (the pool is left running); otherwise a one-shot
    fleet is spawned and shut down."""
    from videoquery.pipeline.extract import gather_signatures

    if new_size is None:
        new_size = extractor._decode_size()
    own_pool = pool is None
    if own_pool:
        if workers <= 0:
            workers = min(len(paths), max(1, (os.cpu_count() or 1) - 1))
        workers = max(1, min(workers, len(paths)))
        pool = WorkerPool(workers, extractor.cfg, extractor.flow_res_div,
                          new_size, queue_window=window_batches)
    try:
        sigs, errors = stream_dispatch(pool, paths,
                                       extractor._dispatch_payload)
    finally:
        if own_pool:
            pool.shutdown()
    if errors:
        raise RuntimeError(
            f"{len(errors)}/{len(paths)} videos failed:\n" + "\n".join(errors))
    out = {}
    for vi, path in enumerate(paths):
        batches = sorted(sigs[vi], key=lambda s: s.clip_numbers[0])
        out[path] = gather_signatures(batches)
    return out
