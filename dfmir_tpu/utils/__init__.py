from dfmir_tpu.utils.util import (
    copyconf, mkdirs, save_image, str2bool, tensor2im,
)
from dfmir_tpu.utils.html import HTML
from dfmir_tpu.utils.visualizer import Visualizer, save_images
from dfmir_tpu.utils.jac_vis import (
    diverging_rgb, jac_det_to_rgb, midpoint_normalize, overlay,
)
from dfmir_tpu.utils.image_pool import ImagePool

__all__ = [
    "copyconf", "mkdirs", "save_image", "str2bool", "tensor2im",
    "HTML", "Visualizer", "save_images",
    "diverging_rgb", "jac_det_to_rgb", "midpoint_normalize", "overlay",
    "ImagePool",
]
