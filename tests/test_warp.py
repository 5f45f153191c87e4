"""Warp-op parity vs torch grid_sample (the reference's underlying kernel).

The golden model is the documented SpatialTransformer composition
(/root/reference/models/voxelmorph/torchvoxelmorph/layers.py:30-48): pixel
grid + flow, per-axis [-1,1] normalization, channel reversal, grid_sample
with align_corners=True.  We re-derive it here from torch primitives.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from dfmir_tpu.ops import warp, vecint, resize_flow, resize_linear


def torch_stn_2d(src_bchw, flow_bchw, mode="bilinear"):
    B, C, H, W = src_bchw.shape
    ys, xs = torch.meshgrid(torch.arange(H), torch.arange(W), indexing="ij")
    grid = torch.stack([ys, xs]).float()[None]
    locs = grid + flow_bchw
    locs[:, 0] = 2 * (locs[:, 0] / (H - 1) - 0.5)
    locs[:, 1] = 2 * (locs[:, 1] / (W - 1) - 0.5)
    locs = locs.permute(0, 2, 3, 1)[..., [1, 0]]
    return F.grid_sample(src_bchw, locs, align_corners=True, mode=mode)


def torch_stn_3d(src, flow, mode="bilinear"):
    B, C, D, H, W = src.shape
    zs, ys, xs = torch.meshgrid(
        torch.arange(D), torch.arange(H), torch.arange(W), indexing="ij"
    )
    grid = torch.stack([zs, ys, xs]).float()[None]
    locs = grid + flow
    for i, s in enumerate((D, H, W)):
        locs[:, i] = 2 * (locs[:, i] / (s - 1) - 0.5)
    locs = locs.permute(0, 2, 3, 4, 1)[..., [2, 1, 0]]
    return F.grid_sample(src, locs, align_corners=True, mode=mode)


def to_nhwc(x_bchw):
    return jnp.asarray(np.moveaxis(x_bchw, 1, -1))


def test_warp1d_linear(rng):
    """1-D flows (reference SpatialTransformer accepts 1/2/3-D,
    layers.py:6-48).  Golden: manual zero-padded linear interpolation."""
    B, W, C = 2, 37, 3
    src = rng.standard_normal((B, W, C)).astype(np.float32)
    flow = (rng.standard_normal((B, W, 1)) * 4).astype(np.float32)
    pos = np.arange(W)[None, :, None] + flow          # (B, W, 1)
    x = pos[..., 0]
    x0 = np.floor(x).astype(np.int64)
    wx = (x - x0)[..., None]

    def corner(xi):
        valid = ((xi >= 0) & (xi <= W - 1))[..., None]
        v = np.take_along_axis(src, np.clip(xi, 0, W - 1)[..., None], axis=1)
        return v * valid

    golden = corner(x0) * (1 - wx) + corner(x0 + 1) * wx
    ours = warp(jnp.asarray(src), jnp.asarray(flow), mode="bilinear")
    np.testing.assert_allclose(np.asarray(ours), golden, atol=1e-5)
    near = warp(jnp.asarray(src), jnp.asarray(flow), mode="nearest")
    xi = np.rint(x).astype(np.int64)
    np.testing.assert_allclose(np.asarray(near), corner(xi), atol=1e-6)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("shape", [(2, 3, 16, 24), (1, 1, 32, 32)])
def test_warp2d_matches_torch(rng, mode, shape):
    B, C, H, W = shape
    src = rng.standard_normal(shape).astype(np.float32)
    flow = (rng.standard_normal((B, 2, H, W)) * 3).astype(np.float32)
    # keep nearest-mode coords away from exact .5 ties (fp order differs)
    if mode == "nearest":
        frac = flow - np.floor(flow)
        flow = np.where(np.abs(frac - 0.5) < 1e-3, flow + 0.01, flow)

    golden = torch_stn_2d(torch.from_numpy(src), torch.from_numpy(flow), mode)
    ours = warp(to_nhwc(src), to_nhwc(flow), mode=mode, impl="xla")
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours), -1, 1), golden.numpy(), atol=1e-5
    )


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_warp3d_matches_torch(rng, mode):
    B, C, D, H, W = 1, 2, 8, 10, 12
    src = rng.standard_normal((B, C, D, H, W)).astype(np.float32)
    flow = (rng.standard_normal((B, 3, D, H, W)) * 2).astype(np.float32)
    if mode == "nearest":
        frac = flow - np.floor(flow)
        flow = np.where(np.abs(frac - 0.5) < 1e-3, flow + 0.01, flow)

    golden = torch_stn_3d(torch.from_numpy(src), torch.from_numpy(flow), mode)
    ours = warp(to_nhwc(src), to_nhwc(flow), mode=mode, impl="xla")
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours), -1, 1), golden.numpy(), atol=1e-5
    )


def test_warp_zero_flow_is_identity(rng):
    src = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    out = warp(jnp.asarray(src), jnp.zeros((2, 16, 16, 2)))
    np.testing.assert_allclose(np.asarray(out), src, atol=1e-6)


def test_warp_integer_shift(rng):
    src = rng.standard_normal((1, 8, 8, 1)).astype(np.float32)
    flow = np.zeros((1, 8, 8, 2), np.float32)
    flow[..., 1] = 1.0  # sample from x+1
    out = np.asarray(warp(jnp.asarray(src), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, :, :-1, 0], src[0, :, 1:, 0], atol=1e-6)
    np.testing.assert_allclose(out[0, :, -1, 0], 0.0, atol=1e-6)  # zero pad


def test_vecint_matches_torch(rng):
    """VecInt = scale then nsteps of self-composition (layers.py:64-68)."""
    B, H, W = 1, 24, 24
    vec = (rng.standard_normal((B, 2, H, W)) * 2).astype(np.float32)

    t = torch.from_numpy(vec) * (1.0 / 2 ** 7)
    for _ in range(7):
        t = t + torch_stn_2d(t, t)
    ours = vecint(to_nhwc(vec), nsteps=7, impl="xla")
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours), -1, 1), t.numpy(), atol=1e-4
    )


@pytest.mark.parametrize("factor", [0.5, 2.0])
def test_resize_flow_matches_torch(rng, factor):
    """ResizeTransform semantics (layers.py:85-94)."""
    B, H, W = 2, 16, 20
    flow = rng.standard_normal((B, 2, H, W)).astype(np.float32)
    t = torch.from_numpy(flow)
    if factor < 1:
        t = F.interpolate(t, align_corners=True, scale_factor=factor, mode="bilinear")
        t = factor * t
    else:
        t = factor * t
        t = F.interpolate(t, align_corners=True, scale_factor=factor, mode="bilinear")
    ours = resize_flow(to_nhwc(flow), factor)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours), -1, 1), t.numpy(), atol=1e-5
    )


def test_resize_linear_3d_matches_torch(rng):
    x = rng.standard_normal((1, 2, 8, 10, 12)).astype(np.float32)
    t = F.interpolate(
        torch.from_numpy(x), size=(16, 20, 24), align_corners=True, mode="trilinear"
    )
    ours = resize_linear(jnp.asarray(np.moveaxis(x, 1, -1)), (16, 20, 24))
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours), -1, 1), t.numpy(), atol=1e-5
    )
