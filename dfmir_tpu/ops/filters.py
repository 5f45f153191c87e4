"""Antialiased binomial-filter down/upsampling.

Semantics of the reference Downsample / Upsample blur layers
(/root/reference/models/networks.py:15-93):

- ``binomial_filter(n)``: normalized outer product of the n-th binomial row.
- ``blur_downsample``: pad (reflect by default), depthwise-conv with the
  binomial filter at stride 2.
- ``blur_upsample``: replicate-pad by 1, stride-2 transposed depthwise conv
  with the binomial filter scaled by stride**2 and torch padding
  ``1 + (filt_size-1)//2``, then crop ``[1:, 1:]`` (and ``[:-1, :-1]`` for
  even filter sizes) — the reference's exact asymmetric crop.

Layout NHWC; depthwise convs via ``feature_group_count=C`` so XLA fuses the
blur into neighboring ops.  Supports 1/2/3 spatial dims (the reference is 2-D
only; 3-D is needed for volumetric generators).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def binomial_filter(filt_size: int) -> np.ndarray:
    """1-D binomial filter coefficients (unnormalized), e.g. 3 -> [1, 2, 1]."""
    if not 1 <= filt_size <= 7:
        raise ValueError(f"filt_size must be in [1, 7], got {filt_size}")
    a = np.array([1.0])
    for _ in range(filt_size - 1):
        a = np.convolve(a, [1.0, 1.0])
    return a


def _nd_filter(filt_size: int, nd: int) -> np.ndarray:
    a = binomial_filter(filt_size)
    f = a
    for _ in range(nd - 1):
        f = np.multiply.outer(f, a)
    return (f / f.sum()).astype(np.float32)


_PAD_MODES = {"reflect": "reflect", "refl": "reflect",
              "replicate": "edge", "repl": "edge", "zero": "constant"}


def _depthwise_conv(x, filt, stride, nd):
    C = x.shape[-1]
    rhs = jnp.asarray(filt, x.dtype).reshape(filt.shape + (1, 1))
    rhs = jnp.tile(rhs, (1,) * nd + (1, C))
    dn = {1: ("NHC", "HIO", "NHC"),
          2: ("NHWC", "HWIO", "NHWC"),
          3: ("NDHWC", "DHWIO", "NDHWC")}[nd]
    return jax.lax.conv_general_dilated(
        x, rhs, window_strides=(stride,) * nd, padding="VALID",
        dimension_numbers=dn, feature_group_count=C)


@functools.partial(jax.jit, static_argnames=("filt_size", "stride", "pad_type", "pad_off"))
def blur_downsample(x, filt_size: int = 3, stride: int = 2,
                    pad_type: str = "reflect", pad_off: int = 0):
    """Antialiased downsample of (B, *spatial, C)."""
    nd = x.ndim - 2
    lo = (filt_size - 1) // 2 + pad_off
    hi = int(np.ceil((filt_size - 1) / 2)) + pad_off
    pad_width = [(0, 0)] + [(lo, hi)] * nd + [(0, 0)]
    mode = _PAD_MODES[pad_type]
    if filt_size == 1:
        if pad_off != 0:
            x = jnp.pad(x, pad_width, mode=mode)
        sl = (slice(None),) + (slice(None, None, stride),) * nd + (slice(None),)
        return x[sl]
    x = jnp.pad(x, pad_width, mode=mode)
    filt = _nd_filter(filt_size, nd)
    return _depthwise_conv(x, filt, stride, nd)


@functools.partial(jax.jit, static_argnames=("filt_size", "stride", "pad_type"))
def blur_upsample(x, filt_size: int = 4, stride: int = 2, pad_type: str = "repl"):
    """Antialiased 2x upsample of (B, *spatial, C) (reference Upsample)."""
    nd = x.ndim - 2
    C = x.shape[-1]
    pad_size = (filt_size - 1) // 2
    filt_odd = filt_size % 2 == 1
    x = jnp.pad(x, [(0, 0)] + [(1, 1)] * nd + [(0, 0)], mode=_PAD_MODES[pad_type])

    filt = _nd_filter(filt_size, nd) * (stride ** nd)
    # torch conv_transpose(stride=s, padding=p) == dilated conv with
    # lhs_dilation=s and symmetric padding (k - 1 - p); the binomial filter is
    # symmetric so no kernel flip is needed.
    p = filt_size - 1 - (1 + pad_size)
    rhs = jnp.asarray(filt, x.dtype).reshape(filt.shape + (1, 1))
    rhs = jnp.tile(rhs, (1,) * nd + (1, C))
    dn = {1: ("NHC", "HIO", "NHC"),
          2: ("NHWC", "HWIO", "NHWC"),
          3: ("NDHWC", "DHWIO", "NDHWC")}[nd]
    out = jax.lax.conv_general_dilated(
        x, rhs, window_strides=(1,) * nd, padding=[(p, p)] * nd,
        lhs_dilation=(stride,) * nd, dimension_numbers=dn,
        feature_group_count=C)
    # reference crop: [1:, 1:] always, [:-1, :-1] when the filter is even
    sl = (slice(None),) + (slice(1, None if filt_odd else -1),) * nd + (slice(None),)
    return out[sl]
