from dfmir_tpu.losses.nce import patch_nce_loss
from dfmir_tpu.losses.similarity import (
    cross_entropy_loss, dice_loss, masked_l1, masked_l2, mse_loss,
    ncc_loss, ncc_map, nll_loss, nmi_loss, tukey_biweight,
)
from dfmir_tpu.losses.regularizers import smoothness_loss, grad_loss
from dfmir_tpu.losses.gan import gan_loss, gradient_penalty
from dfmir_tpu.losses.registry import DICT_LOSSES, get_loss
from dfmir_tpu.losses.contrastive import nt_xent_loss, smooth_loss_3d

__all__ = [
    "patch_nce_loss", "ncc_loss", "ncc_map", "masked_l1", "masked_l2",
    "mse_loss", "dice_loss", "nmi_loss", "tukey_biweight",
    "cross_entropy_loss", "nll_loss", "smoothness_loss", "grad_loss",
    "gan_loss", "gradient_penalty", "DICT_LOSSES", "get_loss",
    "nt_xent_loss", "smooth_loss_3d",
]
