"""Dense-flow spatial-transformer warps (the framework's hot kernel).

Semantics match the reference SpatialTransformer
(/root/reference/models/voxelmorph/torchvoxelmorph/layers.py:6-48), which
composes three steps: ``new_locs = identity_grid + flow`` in pixel units,
per-axis normalization to [-1, 1] with ``2 * (p / (S - 1) - 0.5)``, and
``F.grid_sample(align_corners=True, padding_mode='zeros')`` with reversed
channel order.  With align_corners=True the normalize/unnormalize pair is an
exact identity, so the whole transformer is equivalent to sampling the source
at absolute pixel coordinates ``identity + flow`` with zero padding outside
the image — which is what we implement directly (no normalized-coordinate
round trip, fewer ops, bit-identical results).

Layout: NHWC.  ``src (B, *spatial, C)``, ``flow (B, *spatial, nd)`` where
``flow[..., i]`` displaces spatial axis ``i``.

The default implementation is pure JAX (XLA fuses the index math; the gathers
lower to TPU dynamic-gather).  A fused Pallas kernel is available via
``dfmir_tpu.ops.warp_pallas`` and is selected automatically on TPU for
supported shapes (see ``warp``'s ``impl`` argument).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def identity_grid(spatial, dtype=jnp.float32):
    """Pixel-coordinate identity grid, shape (*spatial, ndims)."""
    nd = len(spatial)
    axes = [
        jax.lax.broadcasted_iota(dtype, tuple(spatial), dimension=i)
        for i in range(nd)
    ]
    return jnp.stack(axes, axis=-1)


def _gather1d(src, ix):
    """src (B,W,C); ix (B,w) int32 -> (B,w,C)."""
    return jnp.take_along_axis(src, ix[..., None], axis=1)


def _sample1d_linear(src, x):
    """Linear sample of src (B,W,C) at absolute pixel coords x (B,w).

    The 1-D case of the reference SpatialTransformer
    (/root/reference/models/voxelmorph/torchvoxelmorph/layers.py:6-48 accepts
    1/2/3-D): zero padding outside [0, W-1], align_corners identity."""
    B, W, C = src.shape
    x0 = jnp.floor(x)
    wx = (x - x0)[..., None]
    x0i = x0.astype(jnp.int32)

    def corner(xi):
        valid = (xi >= 0) & (xi <= W - 1)
        v = _gather1d(src, jnp.clip(xi, 0, W - 1))
        return v * valid[..., None].astype(src.dtype)

    one = jnp.ones((), src.dtype)
    return corner(x0i) * (one - wx) + corner(x0i + 1) * wx


def _sample1d_nearest(src, x):
    B, W, C = src.shape
    xi = jnp.rint(x).astype(jnp.int32)
    valid = (xi >= 0) & (xi <= W - 1)
    v = _gather1d(src, jnp.clip(xi, 0, W - 1))
    return v * valid[..., None].astype(src.dtype)


def _gather2d(src, iy, ix):
    """src (B,H,W,C); iy/ix (B,h,w) int32 -> (B,h,w,C) via one linear gather."""
    B, H, W, C = src.shape
    lin = iy * W + ix
    flat = src.reshape(B, H * W, C)
    out = jnp.take_along_axis(flat, lin.reshape(B, -1, 1), axis=1)
    return out.reshape(B, iy.shape[1], iy.shape[2], C)


def _gather3d(src, iz, iy, ix):
    B, D, H, W, C = src.shape
    lin = (iz * H + iy) * W + ix
    flat = src.reshape(B, D * H * W, C)
    out = jnp.take_along_axis(flat, lin.reshape(B, -1, 1), axis=1)
    return out.reshape(B, iz.shape[1], iz.shape[2], iz.shape[3], C)


def _sample2d_bilinear(src, y, x):
    """Bilinear sample of src (B,H,W,C) at absolute pixel coords y/x (B,h,w)."""
    B, H, W, C = src.shape
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = (y - y0)[..., None]
    wx = (x - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def corner(yi, xi):
        valid = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
        v = _gather2d(src, jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1))
        return v * valid[..., None].astype(src.dtype)

    v00 = corner(y0i, x0i)
    v01 = corner(y0i, x0i + 1)
    v10 = corner(y0i + 1, x0i)
    v11 = corner(y0i + 1, x0i + 1)
    one = jnp.ones((), src.dtype)
    return (
        v00 * (one - wy) * (one - wx)
        + v01 * (one - wy) * wx
        + v10 * wy * (one - wx)
        + v11 * wy * wx
    )


def _sample2d_nearest(src, y, x):
    B, H, W, C = src.shape
    # torch grid_sample 'nearest' rounds the unnormalized coordinate with
    # nearbyint (round half to even) — jnp.rint matches.
    yi = jnp.rint(y).astype(jnp.int32)
    xi = jnp.rint(x).astype(jnp.int32)
    valid = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
    v = _gather2d(src, jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1))
    return v * valid[..., None].astype(src.dtype)


def _sample3d_trilinear(src, z, y, x):
    B, D, H, W, C = src.shape
    z0 = jnp.floor(z)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wz = (z - z0)[..., None]
    wy = (y - y0)[..., None]
    wx = (x - x0)[..., None]
    z0i = z0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def corner(zi, yi, xi):
        valid = (
            (zi >= 0) & (zi <= D - 1)
            & (yi >= 0) & (yi <= H - 1)
            & (xi >= 0) & (xi <= W - 1)
        )
        v = _gather3d(
            src,
            jnp.clip(zi, 0, D - 1),
            jnp.clip(yi, 0, H - 1),
            jnp.clip(xi, 0, W - 1),
        )
        return v * valid[..., None].astype(src.dtype)

    one = jnp.ones((), src.dtype)
    out = 0.0
    for dz, fz in ((0, one - wz), (1, wz)):
        for dy, fy in ((0, one - wy), (1, wy)):
            for dx, fx in ((0, one - wx), (1, wx)):
                out = out + corner(z0i + dz, y0i + dy, x0i + dx) * fz * fy * fx
    return out


def _sample3d_nearest(src, z, y, x):
    B, D, H, W, C = src.shape
    zi = jnp.rint(z).astype(jnp.int32)
    yi = jnp.rint(y).astype(jnp.int32)
    xi = jnp.rint(x).astype(jnp.int32)
    valid = (
        (zi >= 0) & (zi <= D - 1)
        & (yi >= 0) & (yi <= H - 1)
        & (xi >= 0) & (xi <= W - 1)
    )
    v = _gather3d(
        src,
        jnp.clip(zi, 0, D - 1),
        jnp.clip(yi, 0, H - 1),
        jnp.clip(xi, 0, W - 1),
    )
    return v * valid[..., None].astype(src.dtype)


def grid_sample_pixel(src, coords, mode="bilinear"):
    """Sample ``src`` at absolute pixel coordinates.

    src:    (B, *spatial, C)
    coords: (B, *out_spatial, nd) — absolute pixel positions per output point.
    Zero padding outside the valid range (torch padding_mode='zeros').
    """
    nd = coords.shape[-1]
    if nd == 1:
        x = coords[..., 0]
        if mode in ("bilinear", "linear"):
            return _sample1d_linear(src, x)
        if mode == "nearest":
            return _sample1d_nearest(src, x)
    elif nd == 2:
        y, x = coords[..., 0], coords[..., 1]
        if mode == "bilinear":
            return _sample2d_bilinear(src, y, x)
        if mode == "nearest":
            return _sample2d_nearest(src, y, x)
    elif nd == 3:
        z, y, x = coords[..., 0], coords[..., 1], coords[..., 2]
        if mode in ("bilinear", "trilinear"):
            return _sample3d_trilinear(src, z, y, x)
        if mode == "nearest":
            return _sample3d_nearest(src, z, y, x)
    raise ValueError(f"unsupported mode={mode!r} / ndims={nd}")


@functools.partial(jax.jit, static_argnames=("mode", "impl"))
def warp(src, flow, mode="bilinear", impl="auto"):
    """Warp ``src`` by dense displacement ``flow`` (SpatialTransformer).

    Equivalent to the reference SpatialTransformer(size)(src, flow)
    (/root/reference/models/voxelmorph/torchvoxelmorph/layers.py:30-48).

    src:  (B, *spatial, C)
    flow: (B, *spatial, nd) pixel-unit displacements, flow[..., i] along axis i.
    impl: 'auto' | 'xla' | 'pallas'.
    """
    if impl == "auto":
        impl = _default_impl(src, flow, mode)
    if impl == "pallas":
        from dfmir_tpu.ops import warp_pallas

        return warp_pallas.warp_pallas(src, flow, mode=mode)
    spatial = flow.shape[1:-1]
    coords = identity_grid(spatial, dtype=flow.dtype)[None] + flow
    return grid_sample_pixel(src, coords, mode=mode)


def _default_impl(src, flow, mode):
    # Pallas path: 2-D bilinear on real TPU at kernel-supported shapes
    # (measured 10.6x over the XLA gather at 256^2x8, f32-exact).
    try:
        on_tpu = jax.default_backend() == "tpu"
        # jax.default_device(cpu_dev) redirects placement/compilation to the
        # CPU while default_backend() still reports "tpu" — honor it, or a
        # CPU-context trace (e.g. param init off the tunnel) would embed a
        # pallas_call that Mosaic cannot lower for CPU.
        dd = getattr(jax.config, "jax_default_device", None)
        if dd is not None and getattr(dd, "platform", "tpu") != "tpu":
            on_tpu = False
    except Exception:
        on_tpu = False
    if on_tpu:
        from dfmir_tpu.ops import warp_pallas

        if warp_pallas.AVAILABLE and warp_pallas.supports(src, flow, mode):
            return "pallas"
    return "xla"
