from dfmir_tpu.nets.resnet_gen import (
    ResnetGenerator, ResnetBlock, resnet_generator_specs, nce_feature_dims,
)
from dfmir_tpu.nets.patch_sample import PatchSampleF, l2_normalize
from dfmir_tpu.nets.vxm import VxmDense, VxmUnet, default_unet_features
from dfmir_tpu.nets.unet_gen import UnetGenerator
from dfmir_tpu.nets.discriminators import (
    NLayerDiscriminator, PatchDiscriminator, PixelDiscriminator,
)
from dfmir_tpu.nets.feature_nets import PoolingF, ReshapeF, StridedConvF
from dfmir_tpu.nets.factory import define_D, define_F, define_G
from dfmir_tpu.nets.stylegan2 import (
    MappingNetwork, StyleGAN2Discriminator, StyleGAN2Generator,
    StyleGAN2SynthesisGenerator, TileStyleGAN2Discriminator,
)
from dfmir_tpu.nets.munit import (
    ContentEncoder, Decoder, E_adaIN, GResnet, StyleEncoder,
)
from dfmir_tpu.nets.transfusion import (
    GPTFusion, TransFusionUnet, VxmDenseDual, VxmDenseTransformer,
)

__all__ = [
    "ResnetGenerator", "ResnetBlock", "resnet_generator_specs",
    "nce_feature_dims", "PatchSampleF", "l2_normalize", "VxmDense",
    "VxmUnet", "default_unet_features", "UnetGenerator",
    "NLayerDiscriminator", "PatchDiscriminator", "PixelDiscriminator",
    "PoolingF", "ReshapeF", "StridedConvF",
    "define_D", "define_F", "define_G",
    "MappingNetwork", "StyleGAN2Discriminator", "StyleGAN2Generator",
    "StyleGAN2SynthesisGenerator", "TileStyleGAN2Discriminator",
    "GPTFusion", "TransFusionUnet", "VxmDenseDual", "VxmDenseTransformer",
    "ContentEncoder", "Decoder", "E_adaIN", "GResnet", "StyleEncoder",
]
