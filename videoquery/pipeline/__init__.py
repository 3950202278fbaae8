from videoquery.pipeline.sampling import frame_ticks, clip_ranges
from videoquery.pipeline.preprocess import (
    preprocess_rgb,
    preprocess_flow,
    BGR_MEAN,
    FLOW_MEAN,
)

__all__ = [
    "frame_ticks",
    "clip_ranges",
    "preprocess_rgb",
    "preprocess_flow",
    "BGR_MEAN",
    "FLOW_MEAN",
]
