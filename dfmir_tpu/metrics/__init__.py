from dfmir_tpu.metrics.segmentation import (
    dice_score, hausdorff_distance, label_dice,
)
from dfmir_tpu.metrics.image import deepsim, ncc_metric, psnr

__all__ = ["dice_score", "hausdorff_distance", "label_dice",
           "deepsim", "ncc_metric", "psnr"]
