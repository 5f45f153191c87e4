"""Antialiased blur down/upsample parity vs torch (reference networks.py:15-93)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from dfmir_tpu.ops import blur_downsample, blur_upsample, binomial_filter


def torch_filter(filt_size):
    a = torch.from_numpy(binomial_filter(filt_size)).float()
    f = a[:, None] * a[None, :]
    return f / f.sum()


def torch_blur_down(x, channels, filt_size=3, stride=2, pad_off=0):
    lo = (filt_size - 1) // 2 + pad_off
    hi = int(np.ceil((filt_size - 1) / 2)) + pad_off
    x = F.pad(x, (lo, hi, lo, hi), mode="reflect")
    if filt_size == 1:
        return x[:, :, ::stride, ::stride]
    filt = torch_filter(filt_size)[None, None].repeat(channels, 1, 1, 1)
    return F.conv2d(x, filt, stride=stride, groups=channels)


def torch_blur_up(x, channels, filt_size=4, stride=2):
    pad_size = (filt_size - 1) // 2
    filt = torch_filter(filt_size)[None, None].repeat(channels, 1, 1, 1) * stride ** 2
    xp = F.pad(x, (1, 1, 1, 1), mode="replicate")
    out = F.conv_transpose2d(
        xp, filt, stride=stride, padding=1 + pad_size, groups=channels
    )[:, :, 1:, 1:]
    if filt_size % 2 == 1:
        return out
    return out[:, :, :-1, :-1]


def to_nhwc(x):
    return jnp.asarray(np.moveaxis(x, 1, -1))


def from_nhwc(x):
    return np.moveaxis(np.asarray(x), -1, 1)


@pytest.mark.parametrize("filt_size", [1, 2, 3, 4, 5])
def test_blur_downsample(rng, filt_size):
    x = rng.standard_normal((2, 4, 16, 16)).astype(np.float32)
    golden = torch_blur_down(torch.from_numpy(x), 4, filt_size=filt_size)
    ours = blur_downsample(to_nhwc(x), filt_size=filt_size)
    np.testing.assert_allclose(from_nhwc(ours), golden.numpy(), atol=1e-5)


@pytest.mark.parametrize("filt_size", [3, 4, 5])
def test_blur_upsample(rng, filt_size):
    x = rng.standard_normal((2, 4, 12, 12)).astype(np.float32)
    golden = torch_blur_up(torch.from_numpy(x), 4, filt_size=filt_size)
    ours = blur_upsample(to_nhwc(x), filt_size=filt_size)
    assert from_nhwc(ours).shape == golden.shape
    np.testing.assert_allclose(from_nhwc(ours), golden.numpy(), atol=1e-5)


def test_downsample_output_shape():
    x = jnp.zeros((1, 256, 256, 8))
    assert blur_downsample(x).shape == (1, 128, 128, 8)


def test_upsample_output_shape():
    x = jnp.zeros((1, 64, 64, 8))
    assert blur_upsample(x).shape == (1, 128, 128, 8)
