"""Host-side (jax-free) batch-payload construction for extraction.

Everything a decode worker PROCESS needs to turn a video into compact
upload payloads — clip planning, flow-grid geometry, gray/tick/crop/yuv
packing, and the constant-memory streaming generator — with no jax
import anywhere in the chain (numpy + cv2 only): a spawned worker starts
in well under a second instead of paying the multi-second jax import
(pipeline/mpstream.py). The device half lives in pipeline.extract, which
re-exports these names."""

from __future__ import annotations

import dataclasses
import logging
from typing import Iterator

import numpy as np

from videoquery.core.config import ExtractionConfig
from videoquery.pipeline import decode
from videoquery.pipeline.sampling import clip_ranges, frame_ticks

log = logging.getLogger(__name__)


def flow_grid_shape(h0: int, w0: int, flow_res_div: int) -> tuple[int, int]:
    """(fh, fw) of the reduced flow grid for native frames of (h0, w0).
    Heights snap to multiples of 8 (sublane tile); widths >= 128 snap down
    to lane-tile multiples (a 170-wide grid pads to 256 lanes inside every
    Pallas roll — 1.5x wasted VPU work; 128 is pad-free). Shared by the
    on-device gray path (extract._flow_gray_grid) and the host-gray upload
    path (decode.gray_flow_grid) so both produce the same program
    geometry."""
    if flow_res_div <= 1:
        return h0, w0
    fh = max(8, (h0 // flow_res_div) // 8 * 8)
    fw0 = w0 // flow_res_div
    fw = (fw0 // 128 * 128) if fw0 >= 128 else fw0
    return fh, fw


def plan_groups(n_frames: int, cfg: ExtractionConfig, clip_numbers=None):
    """[(group_of_ranges, clip_numbers)] — full clips batched, odd tails
    solo (one compile per geometry)."""
    ranges = clip_ranges(n_frames, cfg.fps, cfg.clip_seconds,
                         cfg.min_tail_seconds)
    if clip_numbers is None:
        clip_numbers = list(range(1, len(ranges) + 1))
    bsz = cfg.batch_clips
    full = [r for r in ranges if r[1] - r[0] + 1 == cfg.frames_per_clip]
    tail = [r for r in ranges if r[1] - r[0] + 1 != cfg.frames_per_clip]
    groups = [full[i:i + bsz] for i in range(0, len(full), bsz)]
    groups += [[r] for r in tail]  # odd-length tails run solo
    return [(g, [clip_numbers[ranges.index(r)] for r in g])
            for g in groups]


@dataclasses.dataclass
class BatchPayload:
    """Host-built upload payload for one clip batch — everything the device
    step needs, with NO jax state, so it can be built in a decode worker
    PROCESS (pipeline/mpstream.py) and shipped to the dispatching process
    (the multi-core reincarnation of the reference's Pool-of-decoders,
    build_wof_clips.py:175-184)."""

    nums: list[int]                    # clip numbers
    f_len: int                         # real frames per clip (tail < fpc)
    clip_rgb: np.ndarray               # rgb payload (layout depends on cfg)
    gray: "np.ndarray | None"          # [B, fpc, fh, fw] u8 (host_gray)
    native_hw: "tuple[int, int] | None"


def build_payload(frames, gray, group, nums, cfg: ExtractionConfig,
                  flow_res_div: int) -> BatchPayload:
    """The host half of a signature batch (pure numpy/cv2; see
    Extractor._dispatch_payload for the device half).

    frames: uint8 [N, H, W, 3] ndarray OR a list of [H, W, 3] frames (the
    streaming window buffer, possibly with a freed None-prefix).
    gray: optional list of per-frame uint8 flow-grid gray, parallel to
    frames (producer-precomputed); ignored unless cfg.host_gray."""
    f_len = group[0][1] - group[0][0] + 1
    is_arr = isinstance(frames, np.ndarray)

    def frame_range(a, b):  # 0-based [a, b)
        return frames[a:b] if is_arr else np.stack(frames[a:b])

    def frame_gather(idxs):  # 0-based index array
        return (frames[idxs] if is_arr
                else np.stack([frames[j] for j in idxs]))

    ticks_rgb = frame_ticks(f_len, cfg.num_ticks, 1)
    gray_np = None
    native_hw = None
    if cfg.host_gray:
        # compact upload: ship only the tick frames + uint8 gray at the
        # flow grid (~4x fewer bytes than all frames) — see the host_gray
        # discussion in the Extractor docstring / docs/TUNING.md
        fpc = cfg.frames_per_clip
        h0, w0 = frames[group[0][0] - 1].shape[:2] if not is_arr \
            else frames.shape[1:3]
        native_hw = (int(h0), int(w0))
        fh, fw = flow_grid_shape(h0, w0, flow_res_div)
        gray_np = np.empty((len(group), fpc, fh, fw), np.uint8)
        for i, (s, e) in enumerate(group):
            if gray is not None:  # producer-precomputed per-frame gray
                gray_np[i, :f_len] = gray[s - 1:e]
            else:
                gray_np[i, :f_len] = decode.gray_flow_grid(
                    frames[s - 1:e], fh, fw)
            if f_len < fpc:
                gray_np[i, f_len:] = gray_np[i, f_len - 1]
        tick0 = ticks_rgb - 1
        clip_rgb = np.stack([frame_gather(s - 1 + tick0)
                             for s, _e in group])
        if cfg.host_crop:
            b_, t_ = clip_rgb.shape[:2]
            clip_rgb = decode.resize_crop_frames(
                clip_rgb.reshape((b_ * t_,) + clip_rgb.shape[2:]),
                cfg.frame_resize, cfg.crop_size,
            ).reshape(b_, t_, cfg.crop_size, cfg.crop_size, 3)
            if cfg.host_yuv420:
                cs = cfg.crop_size
                clip_rgb = decode.bgr_to_yuv420(
                    clip_rgb.reshape(b_ * t_, cs, cs, 3),
                ).reshape(b_, t_, cs * 3 // 2, cs)
    else:
        clip_rgb = np.stack([frame_range(s - 1, e)
                             for s, e in group])      # [B,F,H,W,3]
        if f_len < cfg.frames_per_clip:
            # pad tail clips with last-frame repeats: one compiled geometry
            # per batch size; plans never index the padding (tested)
            rep = np.repeat(clip_rgb[:, -1:],
                            cfg.frames_per_clip - f_len, axis=1)
            clip_rgb = np.concatenate([clip_rgb, rep], axis=1)
    return BatchPayload(list(nums), f_len, clip_rgb, gray_np, native_hw)


def stream_payloads(path: str, cfg: ExtractionConfig, flow_res_div: int,
                    new_size: tuple[int, int] | None) -> Iterator[BatchPayload]:
    """Decode a video and yield upload payloads batch by batch, holding only
    a constant window of frames (jax-free — runs in decode worker processes
    for the multi-core producer, pipeline/mpstream.py, and on the producer
    thread of Extractor.extract_video_stream).

    Streams only FULL clip batches while decoding; the tail (and any full
    clips a wrong container count hid) is replanned from the ACTUAL decoded
    frame count — container counts are duration*fps estimates for some
    mp4s/VFR and must not decide clip boundaries. Clip BOUNDARIES are
    count-independent (clip i spans frames [i*fpc, (i+1)*fpc)), but batch
    GROUPING is not, so the replan regroups only the clips not already
    emitted (their frames all sit past the freed prefix: emitted clips are
    a prefix of the full-clip list)."""
    total = decode.probe_frame_count(path)
    usable = max(total - 1, 0)  # first decoded frame skipped (decode.py)
    fpc = cfg.frames_per_clip
    frames: list[np.ndarray | None] = []
    grays: list[np.ndarray] | None = [] if cfg.host_gray else None
    grid = None
    freed = 0
    done_clips: set[int] = set()
    # full-batch plan from the container estimate, consumed as frames arrive
    pending = [(g, nums) for g, nums in plan_groups(usable, cfg)
               if all(e - s + 1 == fpc for s, e in g)] if usable else []
    pi = 0
    for f in decode.video_frames(path, new_size):
        if grays is not None:
            if grid is None:
                grid = flow_grid_shape(f.shape[0], f.shape[1], flow_res_div)
            grays.append(decode.gray_flow_grid(f[None], *grid)[0])
        frames.append(f)
        while pi < len(pending):
            group, nums = pending[pi]
            need = max(e for _s, e in group)
            if len(frames) < need:
                break
            yield build_payload(frames, grays, group, nums, cfg,
                                flow_res_div)
            done_clips.update(nums)
            # later groups only touch indices >= need (ranges are disjoint
            # and monotonic; flow pairs never cross a clip boundary)
            for j in range(freed, need):
                frames[j] = None
                if grays is not None:
                    grays[j] = None
            freed = need
            pi += 1
    actual = len(frames)
    if actual == 0:
        raise IOError(f"no frames decoded from {path!r}")
    if actual < usable:
        log.warning("%s: decoded %d < reported %d frames", path, actual,
                    usable)
    remaining = [(r, n) for group, nums in plan_groups(actual, cfg)
                 for r, n in zip(group, nums) if n not in done_clips]
    full = [(r, n) for r, n in remaining if r[1] - r[0] + 1 == fpc]
    tails = [(r, n) for r, n in remaining if r[1] - r[0] + 1 != fpc]
    bsz = cfg.batch_clips
    for batch in ([full[i:i + bsz] for i in range(0, len(full), bsz)]
                  + [[tl] for tl in tails]):
        yield build_payload(frames, grays, [r for r, _ in batch],
                            [n for _, n in batch], cfg, flow_res_div)
