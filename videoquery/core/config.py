"""Unified typed configuration.

The reference scatters configuration across three mechanisms — env vars
(reference authenticate.py:10-13, broker.py:83-91, hyperparameter.py:5),
argparse CLIs (calcSig_wOF.py:156-177, build_wof_clips.py:133-150,
load_db.py:32-39) and module constants (broker.py:36-59). Here every knob
lives in one dataclass hierarchy; env vars override defaults, CLI flags
override env vars.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Mapping, Sequence

import numpy as np

# Streams in the canonical order the reference uses (broker.py:42-45).
RGB = "rgb"
FLOW = "warped_optical_flow"
DEFAULT_STREAMS: tuple[str, ...] = (RGB, FLOW)

# Process states of the job state machine (compute_matches.py:43,49,104,107).
STATE_IN_PROGRESS = 3
STATE_PROCESSED = 4
STATE_ERROR = 5
STATE_FINALIZED = 7


def compute_eps(default: float = 1.0e-6) -> float:
    """Round-off buffer used by the threshold optimizer and finalize near-miss
    computation (reference hyperparameter.py:5,75 and compute_matches.py:84).

    The reference *requires* the COMPUTE_EPS env var; we default it so the
    library is importable standalone.
    """
    raw = os.environ.get("COMPUTE_EPS")
    return float(raw) if raw not in (None, "", "None") else default


def random_seed() -> int | str | None:
    """RANDOM_SEED env contract (reference broker.py:83-84, README.md:35-38):
    the literal string "None" (or unset) means unseeded."""
    raw = os.environ.get("RANDOM_SEED")
    if raw in (None, "", "None"):
        return None
    try:
        return int(raw)
    except ValueError:
        return raw  # CPython's random.seed accepts strings too.


@dataclasses.dataclass(frozen=True)
class HyperParams:
    """Search hyperparameters (reference broker.py:36-59, hyperparameter.py:9-27).

    Immutable — the optimizer returns a new instance instead of mutating
    (the reference mutates `Hyperparameter.weights/.threshold` in place at
    hyperparameter.py:75-76; a frozen dataclass makes round-to-round state
    explicit and jit-friendly).
    """

    default_weights: Mapping[str, float] = dataclasses.field(
        default_factory=lambda: {RGB: 1.0, FLOW: 1.5}
    )
    default_threshold: float = 0.8
    ballast: float = 0.0
    near_miss_default: float = 0.35
    mu: float = 0.0
    streams: tuple[str, ...] = DEFAULT_STREAMS
    feature_name: str = "global_pool"
    f_bootstrap: float = 1.0
    f_memory: float = 0.7
    bootstrap_type: str = "bagging"  # 'simple' | 'partial_update' | 'bagging'
    nbags: int = 3
    # Optimizer grids (reference hyperparameter.py:20-21).
    weight_grid_start: float = 0.5
    weight_grid_stop: float = 2.5
    weight_grid_step: float = 0.05
    threshold_grid_start: float = 0.5
    threshold_grid_stop: float = 1.1
    threshold_grid_step: float = 0.02

    # Mutable round state, carried functionally.
    weights: Mapping[str, float] | None = None
    threshold: float | None = None

    def __post_init__(self):
        if self.bootstrap_type not in ("simple", "partial_update", "bagging"):
            raise ValueError(
                "bootstrap_type must be one of 'simple', 'partial_update', "
                f"'bagging'; got {self.bootstrap_type!r}"
            )
        if not 0.0 < self.f_bootstrap <= 1.0:
            raise ValueError(f"f_bootstrap must be in (0, 1]; got {self.f_bootstrap}")
        if not 0.0 <= self.f_memory <= 1.0:
            raise ValueError(f"f_memory must be in [0, 1]; got {self.f_memory}")
        if not 0.0 <= self.ballast < 1.0:
            raise ValueError(f"ballast must be in [0, 1); got {self.ballast}")
        if self.weights is None:
            object.__setattr__(self, "weights", dict(self.default_weights))
        if self.threshold is None:
            object.__setattr__(self, "threshold", self.default_threshold)

    @property
    def weight_grid(self) -> np.ndarray:
        return np.arange(self.weight_grid_start, self.weight_grid_stop,
                         self.weight_grid_step)

    @property
    def threshold_grid(self) -> np.ndarray:
        return np.arange(self.threshold_grid_start, self.threshold_grid_stop,
                         self.threshold_grid_step)

    def weight_vector(self) -> np.ndarray:
        """Weights as an array in stream order."""
        return np.asarray([self.weights[s] for s in self.streams], np.float64)

    def with_round_state(self, weights: Mapping[str, float],
                         threshold: float) -> "HyperParams":
        return dataclasses.replace(self, weights=dict(weights), threshold=float(threshold))

    def reset_round_state(self) -> "HyperParams":
        return self.with_round_state(self.default_weights, self.default_threshold)


@dataclasses.dataclass(frozen=True)
class SearchConfig:
    """Device-side search engine configuration."""

    feature_dim: int = 1024
    n_splits: int = 3
    similarity_dtype: str = "float32"  # accumulation is always f32
    # Pad the clip axis to a multiple of this for MXU/VPU-friendly tiling.
    clip_pad_multiple: int = 512
    # Search sets at or above this many (padded) clips use the
    # device-resident round (engine.ResidentTable): the similarity table
    # never downloads wholesale — the optimizer gathers the reviewed rows
    # and selection fetches only the banded candidates. Below it, the
    # one-shot full-table download wins (the resident round has ~75 ms of
    # fixed dispatch cost on the tunneled chip; the download leg scales
    # with the set). Round-4 crossover sweep: 10k full 47 ms vs resident
    # 77; 50k 77 vs 74; 100k 131 vs 82 — the full-download leg is also the
    # tunnel-RTT-sensitive one (the r3 "regression" from 83 to 129 ms at
    # 100k was entirely this leg; resident stays 74-108 across sessions).
    big_round_threshold: int = 50_000


@dataclasses.dataclass(frozen=True)
class ExtractionConfig:
    """Two-stream extraction pipeline configuration (reference
    calcSig_wOF.py:156-189 and build_wof_clips.py:133-150)."""

    fps: int = 15
    clip_seconds: int = 10
    num_ticks: int = 25          # frames scored per clip (calcSig_wOF.py:165)
    flow_stack_depth: int = 5    # flow stack (calcSig_wOF.py:185-189)
    frame_resize: tuple[int, int] = (340, 256)  # (W, H), calcSig_wOF.py:94
    crop_size: int = 224
    feature_dim: int = 1024
    feature_blob: str = "global_pool"
    flow_bound: float = 20.0     # dense_flow -b 20 (build_wof_clips.py:70-73)
    min_tail_seconds: int = 2    # remainder clip kept iff >= 2 s (build_wof_clips.py:105)
    batch_clips: int = 8         # clips per device batch in the extractor
    # compute optical flow at frame_res/flow_res_div and rescale flow values
    # to native pixels (quality/speed knob; flow cost scales quadratically).
    # 2 is the validated production default: matches/beats full-res on
    # motion-partner retrieval (incl. fast motion — the clamp covers ±16
    # native px vs ±8 at full res) at ~5x the speed; see docs/TUNING.md.
    flow_res_div: int = 2
    # Temporal warm start (pallas path): solve the full TV-L1 pyramid for
    # one keyframe pair per `flow_warm_group` consecutive pairs; refine the
    # rest from their nearest key's flow at the finest level only.
    # 0/1 disables. 3 is the production default. Round-4 re-gate (corpus
    # v3 under the corrected lambda — the round-3 "EPE identical to cold"
    # claim was an artifact of the 255x-weak data term): the warm shortcut
    # costs real EPE vs cold (group3 mean 0.434 vs 0.250 bare; 0.247 vs
    # 0.196 in the full production config with homography + rescue), with
    # retrieval equal-or-better and ~45% of TV-L1 cost saved — the
    # measured quality/throughput frontier is documented in docs/TUNING.md;
    # set 0 for cold-solve quality at ~0.8x extraction throughput.
    flow_warm_group: int = 3
    # Camera estimation for warm pairs:
    #   "init" (production since round 4) — refine the keyframe's camera
    #          homography on this pair with 3 warm-started LK iterations
    #          (no translation pre-pass, no from-zero convergence);
    #   "own"  — full per-pair estimate (translation conv + 6 LK iters);
    #   "key"  — reuse the keyframe's estimate verbatim.
    # "key" passed the round-3 gate only because the intensity-scale
    # lambda bug (kernels/tvl1.py) made the data term ~255x too weak to
    # expose the stale-camera residual; under the corrected lambda on
    # corpus v3 it costs +0.08 EPE. "init" matches "own" quality (EPE
    # 0.249 vs 0.247, 3 seeds scale 2, full production config) at +4%
    # extraction throughput (own 45.8 / init 47.8 / key 50.8 clips/s,
    # same-session A/B; tools/flow_quality.py --final; docs/TUNING.md).
    flow_warm_camera: str = "init"
    # Fold the grayscale channel dot into the flow-grid bilinear resize as
    # bf16 MXU matmuls (exact resize matrices extracted from
    # jax.image.resize; 10.5 -> 4.5 ms per 8-clip batch). Gray perturbation
    # < 4e-3 on the [0,1] scale; EPE-gated equal to the exact path
    # (tools/flow_quality.py --gray; docs/TUNING.md).
    flow_gray_matmul: bool = True
    # Decode video files straight to frame_resize (one cv2 resize at decode
    # time — the same single resize the reference's predict_single_frame
    # applies to native frames, calcSig_wOF.py:94). Fixes the device
    # program geometry across input resolutions (native-res decode meant
    # one XLA compile AND a different flow grid per video resolution) and
    # shrinks host->device transfers for >SD inputs. The flow stream then
    # always runs at frame_resize/flow_res_div.
    decode_at_target: bool = True
    # Compact upload: compute grayscale + the flow-grid resize on the HOST
    # (cv2, uint8 — the same uint8 gray the reference's dense_flow consumed,
    # build_wof_clips.py:60-73) and upload only the 25 tick frames + gray
    # per clip instead of all 150 RGB frames (~4x fewer bytes). The win is
    # end-to-end only: upload-bound hosts (tunneled chips; PCIe contention
    # at scale) stop paying for frames the device never reads. Device-only
    # benchmarks are unaffected (the gray matmul fold stays the on-device
    # path). Gate PASSED (tools/flow_quality.py --host_gray, 3 seeds, cv2
    # INTER_AREA): EPE equal to ~2e-3 px at both corpus scales, retrieval
    # 0.717 vs 0.650 (beats) at scale 1 and 0.500 vs 0.517 (seed noise) at
    # scale 2 — see docs/TUNING.md. Still off by default because it only
    # pays off upload-bound (the device-gray path is exact f32); bench.py's
    # e2e mode enables it on the tunneled chip.
    host_gray: bool = False
    # On top of host_gray: resize (cv2 INTER_LINEAR, uint8 — the very
    # resize the reference applies inside predict_single_frame,
    # calcSig_wOF.py:94) + center-crop the 25 tick frames on the HOST and
    # upload [T, crop, crop, 3] instead of [T, H, W, 3] (another ~42% off
    # the rgb payload at 340x256 -> 224x224). With decode_at_target the
    # resize is a no-op and the crop is pure slicing — bit-identical to the
    # device path (tested); at native decode sizes the host uint8 resize is
    # MORE reference-faithful than the device float path (caffe-action
    # resizes uint8 frames). Like host_gray, the win is upload-bound-only;
    # bench.py's e2e mode enables it on the tunneled chip.
    host_crop: bool = False
    # On top of host_crop: ship the cropped tick frames as YUV 4:2:0
    # (cv2 COLOR_BGR2YUV_I420 — 1.5 bytes/px instead of 3) and reconstruct
    # BGR on device (nearest chroma upsample + the BT.601 studio-swing
    # constants of cv2's own YUV2BGR_I420, matched to <=2 LSB —
    # tests/test_pipeline.py). Chroma subsampling is the reference's OWN
    # data path: build_wof_clips.py:47 writes every decoded frame as JPEG
    # (4:2:0 chroma + DCT quantization) and calcSig_wOF.py:92-93 feeds the
    # rgb CNN from those JPEGs — this knob applies strictly less chroma
    # loss than the reference applied, and only to the rgb stream (flow
    # runs on the untouched gray payload). Default OFF: the win is
    # upload-bound-only, like host_gray/host_crop; bench.py's e2e mode
    # enables it on the tunneled chip (measured A/B in docs/TUNING.md).
    host_yuv420: bool = False
    # Streaming decode backpressure: the producer thread may run at most
    # this many clip batches ahead of the device before blocking — this is
    # what makes extract_video_stream's memory constant in video length
    # (a fast decoder against a slow/tunneled device otherwise buffers the
    # whole video). Minimum effective value is 2 (one batch in flight + one
    # decoding) so producer and consumer can never deadlock.
    stream_window_batches: int = 3

    def __post_init__(self):
        if self.flow_warm_camera not in ("key", "own", "init"):
            # silently treating a typo ("Key", "keyframe") as "own" would
            # quietly drop the ~45% TV-L1 saving the knob documents
            raise ValueError(
                f"flow_warm_camera must be 'key', 'own' or 'init'; "
                f"got {self.flow_warm_camera!r}")
        if self.host_crop and not self.host_gray:
            # without host_gray the device needs ALL frames for gray/flow;
            # cropped full-clip uploads would corrupt the flow stream
            raise ValueError("host_crop requires host_gray=True "
                             "(it crops the compact tick-frame upload)")
        if self.host_yuv420:
            if not self.host_crop:
                # the device unpack assumes fixed, even crop geometry; on
                # uncropped frames the chroma planes would not tile
                raise ValueError("host_yuv420 requires host_crop=True "
                                 "(it packs the cropped tick frames)")
            if self.crop_size % 4:
                raise ValueError("host_yuv420 needs crop_size % 4 == 0 "
                                 "(I420 stores chroma rows pairwise)")

    @property
    def frames_per_clip(self) -> int:
        return self.fps * self.clip_seconds


@dataclasses.dataclass(frozen=True)
class BrokerConfig:
    """Broker service configuration (reference broker.py:19-31, entrypoint.sh)."""

    base_url: str = "http://127.0.0.1:8000/"
    loop_seconds: float = 5.0            # broker.py:19
    threading: bool = dataclasses.field(
        default_factory=lambda: os.environ.get("BROKER_THREADING") == "True"
    )
    log_dir: str = "logs"
    report_dir: str = "final_reports"
    # state-3 job lease (service/lease.py): a job stuck "in progress" longer
    # than this is reset to its requesting state on the next poll. 0 turns
    # recovery off. The reference had no such path — a crashed job stayed in
    # state 3 forever (SURVEY.md §5.3).
    lease_seconds: float = 600.0
    # drain cap per poll: the broker picks up every pending job each poll
    # (batched over shared search sets, service/compute_matches.py) up to
    # this many; the reference took one job per type per 5 s poll
    # (api_repository.py:53-63, broker.py:87)
    max_jobs_per_poll: int = 64

    @staticmethod
    def from_env(**overrides) -> "BrokerConfig":
        kwargs = {}
        if "BASE_URL" in os.environ:
            kwargs["base_url"] = os.environ["BASE_URL"]
        if "BROKER_LEASE_SECONDS" in os.environ:
            kwargs["lease_seconds"] = float(os.environ["BROKER_LEASE_SECONDS"])
        if "BROKER_MAX_JOBS_PER_POLL" in os.environ:
            kwargs["max_jobs_per_poll"] = int(
                os.environ["BROKER_MAX_JOBS_PER_POLL"])
        kwargs.update(overrides)
        return BrokerConfig(**kwargs)


def default_hyperparams() -> HyperParams:
    """The broker's production defaults (reference broker.py:36-59)."""
    return HyperParams()


def stream_index(streams: Sequence[str], stream: str) -> int:
    return list(streams).index(stream)
