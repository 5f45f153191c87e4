"""Network factories (capability of define_G / define_F / define_D,
/root/reference/models/networks.py:218-375): string choice -> flax module.
Modules are returned un-initialized (flax is functional; init happens at
``.init`` with a sample batch — the TPU replacement of init_net + lazy
creation)."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from dfmir_tpu.nets.discriminators import (
    NLayerDiscriminator, PatchDiscriminator, PixelDiscriminator,
)
from dfmir_tpu.nets.feature_nets import PoolingF, ReshapeF, StridedConvF
from dfmir_tpu.nets.patch_sample import PatchSampleF
from dfmir_tpu.nets.resnet_gen import ResnetGenerator
from dfmir_tpu.nets.unet_gen import UnetGenerator


def define_G(input_nc=1, output_nc=1, ngf=64, netG="resnet_9blocks",
             norm="instance", use_dropout=False, init_type="xavier",
             init_gain=0.02, no_antialias=False, no_antialias_up=False,
             size=256, stylegan2_num_downsampling=1):
    if netG.startswith("resnet_") and netG.endswith("blocks"):
        n_blocks = int(netG[len("resnet_"):-len("blocks")])
        return ResnetGenerator(
            input_nc=input_nc, output_nc=output_nc, ngf=ngf,
            n_blocks=n_blocks, norm=norm, use_dropout=use_dropout,
            no_antialias=no_antialias, no_antialias_up=no_antialias_up,
            init_type=init_type, init_gain=init_gain)
    if netG in ("unet_128", "unet_256"):
        num_downs = 7 if netG == "unet_128" else 8
        return UnetGenerator(
            input_nc=input_nc, output_nc=output_nc, num_downs=num_downs,
            ngf=ngf, norm=norm, use_dropout=use_dropout,
            init_type=init_type, init_gain=init_gain)
    if netG == "resnet_cat":
        from dfmir_tpu.nets.munit import GResnet

        return GResnet(input_nc=input_nc, output_nc=output_nc, nz=0,
                       num_downs=2, n_res=4, ngf=ngf)
    if netG in ("stylegan2", "smallstylegan2"):
        from dfmir_tpu.nets.stylegan2 import StyleGAN2Generator

        return StyleGAN2Generator(
            input_nc=input_nc, output_nc=output_nc, ngf=ngf,
            n_blocks=8 if netG == "smallstylegan2" else 9, size=size,
            num_downsampling=stylegan2_num_downsampling,
            small=netG == "smallstylegan2")
    raise NotImplementedError(f"Generator model name [{netG}] is not recognized")


def define_F(netF="mlp_sample", netF_nc=256,
             feature_dims: Optional[Sequence[int]] = None,
             strided_specs: Optional[Sequence[Tuple[int, int]]] = None,
             init_type="xavier", init_gain=0.02):
    if netF == "global_pool":
        return PoolingF()
    if netF == "reshape":
        return ReshapeF()
    if netF == "sample":
        return PatchSampleF(feature_dims=tuple(feature_dims or ()),
                            use_mlp=False, init_type=init_type,
                            init_gain=init_gain, nc=netF_nc)
    if netF == "mlp_sample":
        return PatchSampleF(feature_dims=tuple(feature_dims or ()),
                            use_mlp=True, init_type=init_type,
                            init_gain=init_gain, nc=netF_nc)
    if netF == "strided_conv":
        return StridedConvF(specs=tuple(strided_specs or ()),
                            init_type=init_type, init_gain=init_gain)
    raise NotImplementedError(f"projection model name [{netF}] is not recognized")


def define_D(input_nc=1, ndf=64, netD="basic", n_layers_D=3,
             norm="instance", init_type="xavier", init_gain=0.02,
             no_antialias=False, size=256, D_patch_size=64):
    if netD in ("stylegan2", "patchstylegan2", "smallpatchstylegan2"):
        from dfmir_tpu.nets.stylegan2 import StyleGAN2Discriminator

        return StyleGAN2Discriminator(
            input_nc=input_nc, ndf=ndf, size=size,
            patch="patch" in netD, small_patch="smallpatch" in netD)
    if netD == "tilestylegan2":
        from dfmir_tpu.nets.stylegan2 import TileStyleGAN2Discriminator

        return TileStyleGAN2Discriminator(
            input_nc=input_nc, ndf=ndf, patch_size=D_patch_size)
    if netD == "basic":
        return NLayerDiscriminator(
            ndf=ndf, n_layers=3, norm=norm, no_antialias=no_antialias,
            init_type=init_type, init_gain=init_gain)
    if netD == "n_layers":
        return NLayerDiscriminator(
            ndf=ndf, n_layers=n_layers_D, norm=norm,
            no_antialias=no_antialias, init_type=init_type,
            init_gain=init_gain)
    if netD == "pixel":
        return PixelDiscriminator(
            ndf=ndf, norm=norm, init_type=init_type, init_gain=init_gain)
    if netD == "patch":
        return PatchDiscriminator(
            ndf=ndf, norm=norm, no_antialias=no_antialias,
            init_type=init_type, init_gain=init_gain)
    raise NotImplementedError(f"Discriminator model name [{netD}] is not recognized")
