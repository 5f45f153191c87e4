"""Discriminator zoo (capability of /root/reference/models/networks.py:
1326-1429; selectable via ``--netD`` but carrying zero default loss weight in
the paper model — lambda_GAN defaults to 0).

- NLayerDiscriminator: 70x70 PatchGAN; 4x4 convs, LeakyReLU 0.2, with
  antialiased stride (conv s1 + binomial blur-down) unless no_antialias.
- PixelDiscriminator: 1x1-conv pixelGAN.
- PatchDiscriminator: tiles the input into 16x16 patches (folded into the
  batch dim) and scores each with a 2-layer NLayer net.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dfmir_tpu.nets.layers import ConvND, norm_fn
from dfmir_tpu.ops import blur_downsample


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 3
    norm: str = "instance"
    no_antialias: bool = False
    init_type: str = "xavier"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x):
        nf = norm_fn(self.norm)
        kw, padw = 4, 1

        def conv(h, ch, stride, idx):
            return ConvND(ch, kernel=kw, stride=stride, padding=padw,
                          init_type=self.init_type, init_gain=self.init_gain,
                          name=f"conv_{idx}")(h)

        if self.no_antialias:
            h = nn.leaky_relu(conv(x, self.ndf, 2, 0), 0.2)
        else:
            h = nn.leaky_relu(conv(x, self.ndf, 1, 0), 0.2)
            h = blur_downsample(h)
        mult = 1
        for n in range(1, self.n_layers):
            mult_prev, mult = mult, min(2 ** n, 8)
            h = conv(h, self.ndf * mult, 2 if self.no_antialias else 1, n)
            h = nn.leaky_relu(nf(h), 0.2)
            if not self.no_antialias:
                h = blur_downsample(h)
        mult_prev, mult = mult, min(2 ** self.n_layers, 8)
        h = conv(h, self.ndf * mult, 1, self.n_layers)
        h = nn.leaky_relu(nf(h), 0.2)
        return conv(h, 1, 1, self.n_layers + 1)


class PixelDiscriminator(nn.Module):
    ndf: int = 64
    norm: str = "instance"
    init_type: str = "xavier"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x):
        nf = norm_fn(self.norm)

        def conv(h, ch, idx):
            return ConvND(ch, kernel=1, stride=1, padding=0,
                          init_type=self.init_type, init_gain=self.init_gain,
                          name=f"conv_{idx}")(h)

        h = nn.leaky_relu(conv(x, self.ndf, 0), 0.2)
        h = nn.leaky_relu(nf(conv(h, self.ndf * 2, 1)), 0.2)
        return conv(h, 1, 2)


class PatchDiscriminator(nn.Module):
    """16x16 tiling PatchGAN: fold tiles into batch, score with a 2-layer
    NLayer net (reference networks.py:1416-1429)."""

    ndf: int = 64
    norm: str = "instance"
    no_antialias: bool = False
    init_type: str = "xavier"
    init_gain: float = 0.02
    tile: int = 16

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        s = self.tile
        Y, X = H // s, W // s
        x = x.reshape(B, Y, s, X, s, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B * Y * X, s, s, C)
        return NLayerDiscriminator(
            ndf=self.ndf, n_layers=2, norm=self.norm,
            no_antialias=self.no_antialias, init_type=self.init_type,
            init_gain=self.init_gain, name="nlayer")(x)
