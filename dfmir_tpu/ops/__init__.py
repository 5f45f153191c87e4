from dfmir_tpu.ops.warp import warp, grid_sample_pixel, identity_grid
from dfmir_tpu.ops.integrate import vecint, resize_flow, resize_linear
from dfmir_tpu.ops.filters import blur_downsample, blur_upsample, binomial_filter
from dfmir_tpu.ops.jacobian import jacobian_det, folding_fraction
from dfmir_tpu.ops.affine import (
    affine_grid, affine_to_flow, affine_warp, centered_affine,
)
from dfmir_tpu.ops.augment import (
    augment, random_affine_matrix, random_deformation, random_svf_flow,
)

__all__ = [
    "warp", "grid_sample_pixel", "identity_grid",
    "vecint", "resize_flow", "resize_linear",
    "blur_downsample", "blur_upsample", "binomial_filter",
    "jacobian_det", "folding_fraction",
    "affine_grid", "affine_to_flow", "affine_warp", "centered_affine",
    "augment", "random_affine_matrix", "random_deformation",
    "random_svf_flow",
]
