"""Multi-core streaming producer: N decode worker PROCESSES feed one
device dispatcher.

The reference parallelized decode with a multiprocessing.Pool over videos
(build_wof_clips.py:175-184) but ran its compute stage afterwards; here
the workers stream compact upload payloads (pipeline.extract.stream_
payloads: decode at target scale + cv2 gray + tick crop/yuv, constant
memory per worker) over a bounded queue into the single process that owns
the TPU, which uploads and dispatches fused extraction batches as they
arrive. End-to-end approaches max(aggregate decode, upload, device): the
single-threaded producer ceiling (~20 clips/s/core at the bench codec)
scales with cores, which on a one-core host like the bench container it
cannot — measured in docs/TUNING.md.

Workers are `spawn`ed (not forked): the parent holds a live TPU client
whose grpc state must not be duplicated into children; workers never
touch jax."""

from __future__ import annotations

import logging
import multiprocessing as mp
import os
import queue
import traceback
from typing import Sequence

from videoquery.core.config import ExtractionConfig

log = logging.getLogger(__name__)


def _worker(task_q, out_q, cfg: ExtractionConfig, flow_res_div: int,
            new_size) -> None:
    """Decode worker: pull video paths, stream payloads to the dispatcher.
    Top-level function (spawn-picklable); jax-free — payload (not extract)
    keeps the worker's import cost to numpy + cv2."""
    from videoquery.pipeline.payload import stream_payloads

    while True:
        item = task_q.get()
        if item is None:
            return
        vi, path = item
        try:
            for payload in stream_payloads(path, cfg, flow_res_div,
                                           new_size):
                out_q.put(("payload", vi, payload))
            out_q.put(("done", vi, None))
        except Exception:
            out_q.put(("error", vi, f"{path}: {traceback.format_exc()}"))


def extract_videos_mp(extractor, paths: Sequence[str], workers: int = 0,
                      new_size=None, window_batches: int = 4):
    """Extract signatures for many videos with a multi-process producer.

    Returns {path: [ClipSignatures]} (each video's batches sorted by clip
    number, embeddings downloaded in one readback per video). Raises
    RuntimeError listing every failed video AFTER the rest completed
    (a decode failure must not silently truncate the batch job — parity
    with extract_video's raise)."""
    from videoquery.pipeline.extract import gather_signatures

    if new_size is None:
        new_size = extractor._decode_size()
    if workers <= 0:
        workers = min(len(paths), max(1, (os.cpu_count() or 1) - 1))
    workers = max(1, min(workers, len(paths)))
    ctx = mp.get_context("spawn")
    task_q = ctx.Queue()
    # bounded: backpressure a fast decode fleet against a slow device or
    # tunnel (each payload is ~5 MB/clip at production settings)
    out_q = ctx.Queue(maxsize=max(2, window_batches))
    for item in enumerate(paths):
        task_q.put(item)
    for _ in range(workers):
        task_q.put(None)
    procs = [ctx.Process(target=_worker,
                         args=(task_q, out_q, extractor.cfg,
                               extractor.flow_res_div, new_size),
                         daemon=True)
             for _ in range(workers)]
    for p in procs:
        p.start()

    sigs: dict[int, list] = {i: [] for i in range(len(paths))}
    done: set[int] = set()
    errors: list[str] = []

    def handle(kind, vi, obj):
        if kind == "payload":
            sigs[vi].append(extractor._dispatch_payload(obj))
        elif kind == "done":
            done.add(vi)
        else:  # error
            done.add(vi)
            errors.append(obj)
            log.error("extraction worker failed: %s", obj)

    try:
        while len(done) < len(paths):
            try:
                handle(*out_q.get(timeout=5.0))
                continue
            except queue.Empty:
                pass
            if any(p.is_alive() for p in procs):
                continue  # workers just slow (long video); keep waiting
            # Every worker has exited. A worker that hit the None sentinel
            # exits cleanly after 'done'-ing all its videos; one that
            # segfaulted/OOM-killed (cv2 on a malformed file) dies without
            # a message and would hang a bare out_q.get() forever. Drain
            # the stragglers that raced in, then fail the leftovers.
            try:
                while True:
                    handle(*out_q.get_nowait())
            except queue.Empty:
                pass
            for vi, path in enumerate(paths):
                if vi not in done:
                    done.add(vi)
                    errors.append(
                        f"{path}: decode worker died without reporting "
                        "(exitcodes: "
                        f"{[p.exitcode for p in procs]})")
                    log.error("extraction worker died mid-video: %s", path)
    finally:
        for p in procs:
            p.join(timeout=30)
            if p.is_alive():
                p.terminate()
    if errors:
        raise RuntimeError(
            f"{len(errors)}/{len(paths)} videos failed:\n" + "\n".join(errors))
    out = {}
    for vi, path in enumerate(paths):
        batches = sorted(sigs[vi], key=lambda s: s.clip_numbers[0])
        out[path] = gather_signatures(batches)
    return out
