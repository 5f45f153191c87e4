"""Learned affine registration (spatial-transformer localization network).

Capability of the reference's AffineTransformer
(/root/reference/util/layers.py:1063-1095): a small strided-conv
localization tower regresses a per-sample affine matrix from the stacked
(moving, fixed) pair, and the moving image is resampled under it.

TPU-first deltas: N-D (2-D and 3-D) from one module; the regressor's last
layer is zero-initialized with an identity-matrix bias so training starts
from the identity transform (the reference leaves it at the default random
init, which starts from a garbage warp); matrices act on pixel coordinates
about the image center (``ops.affine.centered_affine``), composing directly
with the dense-flow pipeline via ``affine_to_flow``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from dfmir_tpu.nets.layers import ConvND
from dfmir_tpu.ops.affine import affine_to_flow, affine_warp, centered_affine


class AffineLocalizationNet(nn.Module):
    """Regress per-sample (nd, nd+1) pixel-space affine matrices."""

    ndims: int = 2
    enc_features: Sequence[int] = (16, 32, 32)

    @nn.compact
    def __call__(self, moving, fixed):
        x = jnp.concatenate([moving, fixed], axis=-1)
        for i, nf in enumerate(self.enc_features):
            x = ConvND(nf, kernel=3, stride=2, padding=1,
                       name=f"loc_{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(32, name="fc_0")(x)
        x = nn.leaky_relu(x, 0.2)
        nd = self.ndims
        theta = nn.Dense(nd * (nd + 1), name="fc_theta",
                         kernel_init=nn.initializers.zeros_init(),
                         bias_init=nn.initializers.zeros_init())(x)
        theta = theta.reshape(-1, nd, nd + 1)
        linear = theta[:, :, :nd] + jnp.eye(nd, dtype=theta.dtype)[None]
        translation = theta[:, :, nd]
        return centered_affine(moving.shape[1:-1], linear, translation)


class AffineRegistration(nn.Module):
    """Localize + warp: returns (warped_moving, matrix, dense_flow)."""

    ndims: int = 2
    enc_features: Sequence[int] = (16, 32, 32)

    @nn.compact
    def __call__(self, moving, fixed) -> Tuple:
        matrix = AffineLocalizationNet(self.ndims, self.enc_features,
                                       name="loc")(moving, fixed)
        warped = affine_warp(moving, matrix)
        flow = affine_to_flow(matrix, moving.shape[1:-1])
        return warped, matrix, flow
