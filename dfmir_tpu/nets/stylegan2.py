"""StyleGAN2 family (capability of /root/reference/models/stylegan_networks.py:
17-914 — the ``--netG stylegan2 / smallstylegan2`` and ``--netD stylegan2 /
tilestylegan2`` choices; selectable but not the paper default).

TPU-first design decisions (not a translation):

- ``upfirdn2d`` is ONE ``conv_general_dilated`` per call: zero-insertion
  upsampling is lhs_dilation, the FIR filter is a depthwise kernel, and the
  down-factor is the conv stride — instead of the reference's
  reshape/pad/view dance (stylegan_networks.py:37-74).  NHWC layout.
- ``ModulatedConv`` never materializes per-sample weight tensors (the
  reference folds batch into grouped-conv channels, :247-349).  By linearity
  conv(x, w * s_in * d_out) == d_out * conv(x * s_in, w): we scale the
  input by the per-sample style, run ONE shared-weight conv for the whole
  batch (MXU-friendly), and scale the output by the demodulation factor
  computed from w^2 x s^2 via an einsum.
- noise injection draws from flax's 'noise' rng collection when present
  (explicit keys; nothing device-global), else adds no noise
  (deterministic eval).

Channel tables, equalized-lr scaling (N(0,1) init, 1/sqrt(fan_in) runtime
scale), blur pads, fused bias+leaky(0.2)*sqrt(2) activation, and the
residual 1/sqrt(2) all match the reference formulas.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn


def make_kernel(k) -> np.ndarray:
    k = np.asarray(k, np.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / k.sum()


def upfirdn2d(x, kernel: np.ndarray, up: int = 1, down: int = 1,
              pad: Tuple[int, int] = (0, 0)):
    """NHWC up-fir-down: zero-insert x${up}, pad, correlate with the flipped
    FIR kernel, take every ${down}-th sample.  One depthwise conv."""
    C = x.shape[-1]
    kh, kw = kernel.shape
    # upfirdn convolves (flips) the kernel; conv_general_dilated correlates,
    # so flip here to match.
    w = jnp.asarray(kernel[::-1, ::-1].copy(), x.dtype)
    w = jnp.tile(w[:, :, None, None], (1, 1, 1, C))
    pad0, pad1 = pad
    # lhs_dilation yields (h-1)*up+1 samples; the reference zero-stuffs to
    # h*up (up-1 trailing zeros), so add them to the high-side padding.
    pad1 = pad1 + (up - 1)
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(down, down),
        padding=[(pad0, pad1), (pad0, pad1)],
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)


def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=math.sqrt(2)):
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return nn.leaky_relu(x, negative_slope) * scale


def pixel_norm(x, eps: float = 1e-8):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1,
                                      keepdims=True) + eps)


def blur_pad(kernel_len: int, factor: int, conv_kernel: int,
             upsample: bool) -> Tuple[int, int]:
    if upsample:
        p = (kernel_len - factor) - (conv_kernel - 1)
        return ((p + 1) // 2 + factor - 1, p // 2 + 1)
    p = (kernel_len - factor) + (conv_kernel - 1)
    return ((p + 1) // 2, p // 2)


class EqualConv(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0),
                       (self.kernel, self.kernel, C, self.features))
        scale = 1.0 / math.sqrt(C * self.kernel ** 2)
        out = jax.lax.conv_general_dilated(
            x, w * scale, window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros_init(),
                           (self.features,))
            out = out + b
        return out


class EqualLinear(nn.Module):
    features: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        w = self.param("weight", nn.initializers.normal(1.0 / self.lr_mul),
                       (in_dim, self.features))
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        out = x @ (w * scale)
        b = None
        if self.use_bias:
            b = self.param("bias",
                           nn.initializers.constant(self.bias_init),
                           (self.features,)) * self.lr_mul
        if self.activation == "fused_lrelu":
            return fused_leaky_relu(out, b)
        return out + b if b is not None else out


class ConvLayer(nn.Module):
    features: int
    kernel: int = 3
    downsample: bool = False
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True

    @nn.compact
    def __call__(self, x):
        if self.downsample:
            pad = blur_pad(len(self.blur_kernel), 2, self.kernel, False)
            x = upfirdn2d(x, make_kernel(self.blur_kernel), pad=pad)
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel // 2
        x = EqualConv(self.features, self.kernel, stride, padding,
                      use_bias=self.use_bias and not self.activate,
                      name="conv")(x)
        if self.activate:
            if self.use_bias:
                b = self.param("act_bias", nn.initializers.zeros_init(),
                               (self.features,))
                return fused_leaky_relu(x, b)
            return nn.leaky_relu(x, 0.2) * math.sqrt(2)
        return x


class ResBlock(nn.Module):
    features: int
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    downsample: bool = True
    skip_gain: float = 1.0

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = ConvLayer(C, 3, name="conv1")(x)
        h = ConvLayer(self.features, 3, downsample=self.downsample,
                      blur_kernel=self.blur_kernel, name="conv2")(h)
        if C != self.features or self.downsample:
            skip = ConvLayer(self.features, 1, downsample=self.downsample,
                             activate=False, use_bias=False,
                             name="skip")(x)
        else:
            skip = x
        return (h * self.skip_gain + skip) / math.sqrt(
            self.skip_gain ** 2 + 1.0)


class ModulatedConv(nn.Module):
    features: int
    kernel: int = 3
    style_dim: Optional[int] = None
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style=None):
        B, H, W, C = x.shape
        k = self.kernel
        w = self.param("weight", nn.initializers.normal(1.0),
                       (k, k, C, self.features))
        scale = 1.0 / math.sqrt(C * k ** 2)

        if style is not None and self.style_dim:
            s = EqualLinear(C, bias_init=1.0, name="modulation")(style)
        else:
            s = jnp.ones((B, C), x.dtype)

        # modulate input activations; demodulate output channels
        x = x * s[:, None, None, :]
        if self.demodulate:
            w2 = jnp.sum(jnp.square(w * scale), axis=(0, 1))  # (C, out)
            demod = jax.lax.rsqrt(
                jnp.square(s) @ w2 + 1e-8)  # (B, out)

        if self.upsample:
            # torch conv_transpose2d(stride=2, pad=0) == lhs-dilated conv of
            # the spatially-flipped kernel with full padding
            wt = jnp.flip(w * scale, axis=(0, 1))
            out = jax.lax.conv_general_dilated(
                x, wt, window_strides=(1, 1),
                padding=[(k - 1, k - 1)] * 2, lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            pad = blur_pad(len(self.blur_kernel), 2, k, True)
            blur_k = make_kernel(self.blur_kernel) * 4.0
            out = upfirdn2d(out, blur_k, pad=pad)
        elif self.downsample:
            pad = blur_pad(len(self.blur_kernel), 2, k, False)
            x = upfirdn2d(x, make_kernel(self.blur_kernel), pad=pad)
            out = jax.lax.conv_general_dilated(
                x, w * scale, window_strides=(2, 2),
                padding=[(0, 0)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            out = jax.lax.conv_general_dilated(
                x, w * scale, window_strides=(1, 1),
                padding=[(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if self.demodulate:
            out = out * demod[:, None, None, :]
        return out


class NoiseInjection(nn.Module):
    @nn.compact
    def __call__(self, x, noise=None):
        w = self.param("weight", nn.initializers.zeros_init(), (1,))
        if noise is None:
            if self.has_rng("noise"):
                noise = jax.random.normal(
                    self.make_rng("noise"), x.shape[:-1] + (1,), x.dtype)
            else:
                return x
        return x + w * noise


class StyledConv(nn.Module):
    features: int
    kernel: int = 3
    style_dim: Optional[int] = None
    upsample: bool = False
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)
    demodulate: bool = True
    inject_noise: bool = True

    @nn.compact
    def __call__(self, x, style=None, noise=None):
        out = ModulatedConv(self.features, self.kernel, self.style_dim,
                            demodulate=self.demodulate,
                            upsample=self.upsample,
                            blur_kernel=self.blur_kernel,
                            name="conv")(x, style)
        if self.inject_noise:
            out = NoiseInjection(name="noise")(out, noise)
        b = self.param("act_bias", nn.initializers.zeros_init(),
                       (self.features,))
        return fused_leaky_relu(out, b)


class ToRGB(nn.Module):
    style_dim: int
    out_channels: int = 3
    upsample: bool = True
    blur_kernel: Tuple[int, ...] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style, skip=None):
        out = ModulatedConv(self.out_channels, 1, self.style_dim,
                            demodulate=False, name="conv")(x, style)
        b = self.param("bias", nn.initializers.zeros_init(),
                       (self.out_channels,))
        out = out + b
        if skip is not None:
            k = make_kernel(self.blur_kernel) * 4.0
            p = len(self.blur_kernel) - 2
            skip = upfirdn2d(skip, k, up=2,
                             pad=((p + 1) // 2 + 1, p // 2))
            out = out + skip
        return out


def _g_channels(ngf: int):
    m = ngf / 32
    return {r: (min(512, int(round(c * m))) if r <= 32
                else int(round(c * m)))
            for r, c in ((4, 4096), (8, 2048), (16, 1024), (32, 512),
                         (64, 256), (128, 128), (256, 64), (512, 32),
                         (1024, 16))}


def _d_channels(ndf: int):
    m = ndf / 64
    return {r: (min(384, int(c * m)) if r <= 32 else int(c * m))
            for r, c in ((4, 4096), (8, 2048), (16, 1024), (32, 512),
                         (64, 256), (128, 128), (256, 64), (512, 32),
                         (1024, 16))}


class StyleGAN2Encoder(nn.Module):
    input_nc: int = 1
    ngf: int = 64
    n_blocks: int = 6
    size: int = 256
    num_downsampling: int = 1

    @nn.compact
    def __call__(self, x, layers: Sequence[int] = (),
                 get_features: bool = False):
        channels = _g_channels(self.ngf)
        cur = self.size
        ops = [lambda h: h,  # reference keeps an Identity at index 0
               ConvLayer(channels[cur], 1, name="from_rgb")]
        for i in range(self.num_downsampling):
            ops.append(ResBlock(channels[cur // 2], downsample=True,
                                name=f"down_{i}"))
            cur //= 2
        for i in range(self.n_blocks // 2):
            ops.append(ResBlock(channels[cur], downsample=False,
                                name=f"res_{i}"))

        layers = list(layers)
        if -1 in layers:
            layers.append(len(ops) - 1)
        feats = []
        h = x
        for i, op in enumerate(ops):
            h = op(h)
            if i in layers:
                feats.append(h)
        if get_features:
            return h, feats
        return h


class StyleGAN2Decoder(nn.Module):
    output_nc: int = 1
    ngf: int = 64
    n_blocks: int = 6
    size: int = 256
    num_downsampling: int = 1
    inject_noise: bool = True

    @nn.compact
    def __call__(self, x):
        channels = _g_channels(self.ngf)
        cur = self.size // (2 ** self.num_downsampling)
        h = x
        for i in range(self.n_blocks // 2):
            h = ResBlock(channels[cur], downsample=False,
                         name=f"res_{i}")(h)
        for i in range(self.num_downsampling):
            h = StyledConv(channels[cur * 2], 3, upsample=True,
                           inject_noise=self.inject_noise,
                           name=f"up_{i}")(h)
            cur *= 2
        return ConvLayer(self.output_nc, 1, name="to_rgb")(h)


class StyleGAN2Generator(nn.Module):
    """Encoder/decoder image translator (the CUT single-image-translation
    variant, reference :897-914) with encode_only feature taps."""

    input_nc: int = 1
    output_nc: int = 1
    ngf: int = 64
    n_blocks: int = 6
    size: int = 256
    num_downsampling: int = 1
    small: bool = False  # 'smallstylegan2': no noise injection in decoder

    @nn.compact
    def __call__(self, x, layers: Sequence[int] = (),
                 encode_only: bool = False):
        enc = StyleGAN2Encoder(
            self.input_nc, self.ngf, self.n_blocks, self.size,
            self.num_downsampling, name="encoder")
        dec = StyleGAN2Decoder(
            self.output_nc, self.ngf, self.n_blocks, self.size,
            self.num_downsampling, inject_noise=not self.small,
            name="decoder")
        feat, feats = enc(x, layers, get_features=True)
        if encode_only:
            return feats
        fake = dec(feat)
        if layers:
            return fake, feats
        return fake


class StyleGAN2Discriminator(nn.Module):
    input_nc: int = 1
    ndf: int = 64
    size: int = 256
    patch: bool = False       # 'patch' in netD: conv head instead of linear
    small_patch: bool = False

    @nn.compact
    def __call__(self, x):
        channels = _d_channels(self.ndf)
        h = ConvLayer(channels[self.size], 1, name="from_rgb")(x)
        log_size = int(math.log2(self.size))
        final_log2 = 4 if self.small_patch else (3 if self.patch else 2)
        for i in range(log_size, final_log2, -1):
            h = ResBlock(channels[2 ** (i - 1)], name=f"res_{i}")(h)
        h = ConvLayer(channels[4], 3, name="final_conv")(h)
        if self.patch or self.small_patch:
            return ConvLayer(1, 3, use_bias=False, activate=False,
                             name="final_linear")(h)
        B = h.shape[0]
        h = h.reshape(B, -1)
        h = EqualLinear(channels[4], activation="fused_lrelu",
                        name="linear_0")(h)
        return EqualLinear(1, name="linear_1")(h)


class TileStyleGAN2Discriminator(nn.Module):
    """Folds D_patch_size tiles into the batch (reference :786-794)."""

    input_nc: int = 1
    ndf: int = 64
    patch_size: int = 64

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        s = self.patch_size
        Y, X = H // s, W // s
        x = x.reshape(B, Y, s, X, s, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B * Y * X, s, s, C)
        return StyleGAN2Discriminator(
            self.input_nc, self.ndf, size=s, name="disc")(x)


class MappingNetwork(nn.Module):
    """z -> w: PixelNorm + 8 equalized-lr MLP layers (reference :451-464)."""

    style_dim: int = 512
    n_mlp: int = 8
    lr_mlp: float = 0.01

    @nn.compact
    def __call__(self, z):
        h = pixel_norm(z)
        for i in range(self.n_mlp):
            h = EqualLinear(self.style_dim, lr_mul=self.lr_mlp,
                            activation="fused_lrelu", name=f"mlp_{i}")(h)
        return h


class StyleGAN2SynthesisGenerator(nn.Module):
    """The full style-based generator (reference Generator, :439-618):
    learned 4x4 constant -> styled conv pyramid with ToRGB skips."""

    size: int = 256
    style_dim: int = 512
    ngf: int = 64
    out_channels: int = 3

    @nn.compact
    def __call__(self, z, input_is_latent: bool = False):
        channels = _g_channels(self.ngf * 2)  # channel_multiplier=2 default
        w = z if input_is_latent else MappingNetwork(
            self.style_dim, name="mapping")(z)
        B = w.shape[0]
        const = self.param("const_input", nn.initializers.normal(1.0),
                           (1, 4, 4, channels[4]))
        h = jnp.tile(const, (B, 1, 1, 1))
        h = StyledConv(channels[4], 3, self.style_dim,
                       name="conv1")(h, w)
        skip = ToRGB(self.style_dim, self.out_channels, upsample=False,
                     name="to_rgb1")(h, w)
        log_size = int(math.log2(self.size))
        cur = 4
        for i in range(3, log_size + 1):
            cur *= 2
            h = StyledConv(channels[cur], 3, self.style_dim, upsample=True,
                           name=f"conv_{i}_up")(h, w)
            h = StyledConv(channels[cur], 3, self.style_dim,
                           name=f"conv_{i}")(h, w)
            skip = ToRGB(self.style_dim, self.out_channels,
                         name=f"to_rgb_{i}")(h, w, skip)
        return skip
