"""MUNIT-style content/style generator family (capability of the
reference's alternate netG 'resnet_cat' and its encoder/decoder stack:
G_Resnet, ContentEncoder, Decoder/Decoder_all, StyleEncoder, E_adaIN —
/root/reference/models/networks.py:627-930; selectable, unused by the
paper's default path).

Layout NHWC; ``Conv2dBlock`` = pad -> conv -> norm -> activation with the
reference's norm choices (none / instance / layer).  ``G_Resnet`` exposes
the same ``forward(image, style, nce_layers, encode_only)`` contract the
CUT machinery expects, with ContentEncoder Sequential-index feature taps.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from dfmir_tpu.nets.layers import instance_norm, pad_nd, upsample_nearest


def _norm(kind: str):
    if kind in (None, "none"):
        return lambda x: x
    if kind in ("instance", "in"):
        return instance_norm
    if kind in ("ln", "layer"):
        return lambda x: nn.LayerNorm()(x)  # built inside compact callers
    raise NotImplementedError(f"norm {kind}")


def _act(kind: str):
    if kind in (None, "none"):
        return lambda x: x
    if kind == "relu":
        return nn.relu
    if kind == "lrelu":
        return lambda x: nn.leaky_relu(x, 0.2)
    if kind == "tanh":
        return jnp.tanh
    raise NotImplementedError(f"activation {kind}")


class Conv2dBlock(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    norm: str = "none"
    activation: str = "relu"
    pad_type: str = "reflect"

    @nn.compact
    def __call__(self, x):
        if self.padding:
            x = pad_nd(x, self.padding, self.pad_type)
        x = nn.Conv(self.features, (self.kernel,) * 2,
                    strides=(self.stride,) * 2, padding="VALID")(x)
        if self.norm in ("ln", "layer"):
            x = nn.LayerNorm()(x)
        else:
            x = _norm(self.norm)(x)
        return _act(self.activation)(x)


class MunitResBlock(nn.Module):
    dim: int
    norm: str = "instance"
    activation: str = "relu"
    pad_type: str = "reflect"

    @nn.compact
    def __call__(self, x):
        h = Conv2dBlock(self.dim, 3, 1, 1, self.norm, self.activation,
                        self.pad_type)(x)
        h = Conv2dBlock(self.dim, 3, 1, 1, self.norm, "none",
                        self.pad_type)(h)
        return x + h


class ContentEncoder(nn.Module):
    n_downsample: int = 2
    n_res: int = 4
    dim: int = 64
    norm: str = "instance"
    activation: str = "relu"
    pad_type: str = "reflect"

    @nn.compact
    def __call__(self, x, nce_layers: Sequence[int] = (),
                 encode_only: bool = False):
        ops = []
        dim = self.dim
        n_ops = 1 + self.n_downsample + self.n_res
        if nce_layers and (min(nce_layers) < 0 or max(nce_layers) >= n_ops):
            raise ValueError(
                f"nce_layers {tuple(nce_layers)} out of range for "
                f"ContentEncoder ({n_ops} ops); pass e.g. --nce_layers "
                + ",".join(str(i) for i in range(n_ops)))
        ops.append(Conv2dBlock(dim, 7, 1, 3, self.norm, self.activation,
                               "reflect", name="in_conv"))
        for i in range(self.n_downsample):
            ops.append(Conv2dBlock(dim * 2, 4, 2, 1, self.norm,
                                   self.activation, "reflect",
                                   name=f"down_{i}"))
            dim *= 2
        for i in range(self.n_res):
            ops.append(MunitResBlock(dim, self.norm, self.activation,
                                     self.pad_type, name=f"res_{i}"))
        feats = []
        h = x
        for i, op in enumerate(ops):
            h = op(h)
            if i in nce_layers:
                feats.append(h)
            if encode_only and nce_layers and i == max(nce_layers):
                return None, feats
        return h, feats


class Decoder(nn.Module):
    n_upsample: int = 2
    n_res: int = 4
    dim: int = 256
    output_nc: int = 1
    activation: str = "relu"
    pad_type: str = "reflect"

    @nn.compact
    def __call__(self, x, style=None):
        dim = self.dim
        h = x
        if style is not None:
            # 'cat' conditioning: broadcast the style vector spatially,
            # concatenate (reference cat_feature, networks.py:788-795), and
            # fold back to `dim` channels so the residual blocks close
            s = jnp.broadcast_to(style[:, None, None, :],
                                 h.shape[:3] + (style.shape[-1],))
            h = jnp.concatenate([h, s], axis=-1)
            h = Conv2dBlock(dim, 1, 1, 0, "none", self.activation,
                            name="style_fold")(h)
        for i in range(self.n_res):
            h = MunitResBlock(dim, "instance", self.activation,
                              self.pad_type, name=f"res_{i}")(h)
        for i in range(self.n_upsample):
            h = upsample_nearest(h)
            h = Conv2dBlock(dim // 2, 5, 1, 2, "ln", self.activation,
                            "reflect", name=f"up_{i}")(h)
            dim //= 2
        return Conv2dBlock(self.output_nc, 7, 1, 3, "none", "tanh",
                           "reflect", name="out_conv")(h)


class StyleEncoder(nn.Module):
    n_downsample: int = 4
    dim: int = 64
    style_dim: int = 8
    activation: str = "relu"
    vae: bool = False

    @nn.compact
    def __call__(self, x):
        dim = self.dim
        h = Conv2dBlock(dim, 7, 1, 3, "none", self.activation)(x)
        for i in range(2):
            h = Conv2dBlock(dim * 2, 4, 2, 1, "none", self.activation,
                            name=f"down_{i}")(h)
            dim *= 2
        for i in range(self.n_downsample - 2):
            h = Conv2dBlock(dim, 4, 2, 1, "none", self.activation,
                            name=f"keep_{i}")(h)
        h = jnp.mean(h, axis=(1, 2))  # global average pool
        if self.vae:
            mean = nn.Dense(self.style_dim, name="fc_mean")(h)
            logvar = nn.Dense(self.style_dim, name="fc_var")(h)
            return mean, logvar
        return nn.Dense(self.style_dim, name="fc")(h)


class E_adaIN(nn.Module):
    """Style-encoder wrapper (reference E_adaIN, networks.py:658-668)."""

    style_dim: int = 8
    nef: int = 64
    n_layers: int = 4
    vae: bool = False

    @nn.compact
    def __call__(self, x):
        return StyleEncoder(self.n_layers, self.nef, self.style_dim,
                            vae=self.vae, name="enc_style")(x)


class GResnet(nn.Module):
    """Content-encoder + decoder translator with optional style
    conditioning ('resnet_cat'; reference G_Resnet, networks.py:627-651)."""

    input_nc: int = 1
    output_nc: int = 1
    nz: int = 0          # style vector size (0 = unconditional)
    num_downs: int = 2
    n_res: int = 4
    ngf: int = 64

    @nn.compact
    def __call__(self, image, style=None, nce_layers: Sequence[int] = (),
                 encode_only: bool = False, layers: Sequence[int] = ()):
        nce_layers = tuple(nce_layers) or tuple(layers)
        enc = ContentEncoder(self.num_downs, self.n_res, self.ngf,
                             name="enc_content")
        content, feats = enc(image, nce_layers, encode_only)
        if encode_only:
            return feats
        dec = Decoder(self.num_downs, self.n_res,
                      self.ngf * 2 ** self.num_downs, self.output_nc,
                      name="dec")
        out = dec(content, style if self.nz else None)
        if nce_layers:
            return out, feats
        return out
