from dfmir_tpu.losses.nce import patch_nce_loss
from dfmir_tpu.losses.similarity import (
    ncc_loss, ncc_map, masked_l1, mse_loss, dice_loss, nmi_loss,
)
from dfmir_tpu.losses.regularizers import smoothness_loss, grad_loss
from dfmir_tpu.losses.gan import gan_loss, gradient_penalty

__all__ = [
    "patch_nce_loss", "ncc_loss", "ncc_map", "masked_l1", "mse_loss",
    "dice_loss", "nmi_loss", "smoothness_loss", "grad_loss", "gan_loss",
    "gradient_penalty",
]
