"""Affine warps (capability of the reference's SpatialTransformerAffine /
AffineTransformer, /root/reference/util/layers.py:635-723, 1063-1095, and
affine_to_shift in util/tensor_utils.py:254).

Matrices act on *pixel* coordinates: ``p_src = M[:, :nd] @ p_out +
M[:, nd]`` with the same axis ordering as dense flows (axis 0 first).
"""

from __future__ import annotations

import jax.numpy as jnp

from dfmir_tpu.ops.warp import grid_sample_pixel, identity_grid


def affine_grid(matrix, spatial):
    """matrix (B, nd, nd+1) -> absolute source coords (B, *spatial, nd)."""
    nd = len(spatial)
    grid = identity_grid(spatial)  # (*spatial, nd)
    lin = matrix[:, :, :nd]
    off = matrix[:, :, nd]
    coords = jnp.einsum("...j,bij->b...i", grid, lin)
    return coords + off.reshape((-1,) + (1,) * nd + (nd,))


def affine_to_flow(matrix, spatial):
    """Affine matrix -> equivalent dense displacement field."""
    return affine_grid(matrix, spatial) - identity_grid(spatial)[None]


def affine_warp(src, matrix, mode="bilinear"):
    """Warp (B, *spatial, C) by per-sample affine matrices (B, nd, nd+1)."""
    coords = affine_grid(matrix, src.shape[1:-1])
    return grid_sample_pixel(src, coords, mode=mode)


def centered_affine(spatial, linear, translation=None):
    """Build (nd, nd+1) matrices that rotate/scale about the image center.

    linear: (B, nd, nd); translation: (B, nd) in pixels.
    """
    import numpy as np

    nd = len(spatial)
    center = jnp.asarray([(s - 1) / 2.0 for s in spatial], jnp.float32)
    B = linear.shape[0]
    if translation is None:
        translation = jnp.zeros((B, nd), jnp.float32)
    off = center[None] - jnp.einsum("bij,j->bi", linear, center) + translation
    return jnp.concatenate([linear, off[:, :, None]], axis=-1)
