from dfmir_tpu.ops.warp import warp, grid_sample_pixel, identity_grid
from dfmir_tpu.ops.integrate import vecint, resize_flow, resize_linear
from dfmir_tpu.ops.filters import blur_downsample, blur_upsample, binomial_filter
from dfmir_tpu.ops.jacobian import jacobian_det, folding_fraction

__all__ = [
    "warp", "grid_sample_pixel", "identity_grid",
    "vecint", "resize_flow", "resize_linear",
    "blur_downsample", "blur_upsample", "binomial_filter",
    "jacobian_det", "folding_fraction",
]
