from dfmir_tpu.nets.resnet_gen import (
    ResnetGenerator, ResnetBlock, resnet_generator_specs, nce_feature_dims,
)
from dfmir_tpu.nets.patch_sample import PatchSampleF, l2_normalize
from dfmir_tpu.nets.vxm import VxmDense, VxmUnet, default_unet_features

__all__ = [
    "ResnetGenerator", "ResnetBlock", "resnet_generator_specs",
    "nce_feature_dims", "PatchSampleF", "l2_normalize", "VxmDense",
    "VxmUnet", "default_unet_features",
]
