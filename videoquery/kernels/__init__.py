from videoquery.kernels.tvl1 import TVL1Params, tvl1_flow, tvl1_warped_flow
from videoquery.kernels.warp import bilinear_warp, warp_affine
from videoquery.kernels.motion import estimate_affine

__all__ = [
    "TVL1Params",
    "tvl1_flow",
    "tvl1_warped_flow",
    "bilinear_warp",
    "warp_affine",
    "estimate_affine",
]
