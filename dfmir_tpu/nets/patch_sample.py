"""Patch sampling + projection head for PatchNCE.

Mirrors the reference PatchSampleF (mlp_sample)
(/root/reference/models/networks.py:575-624): per tapped layer, flatten the
spatial grid, sample ``num_patches`` random locations (ids shared between the
key and query passes), project through a per-layer 2-layer MLP (in->nc->nc
with ReLU), and L2-normalize with ``x / (||x|| + 1e-7)``.

TPU-first differences: MLPs are declared from static feature dims (computed
from the generator architecture via ``nce_feature_dims``) instead of being
created lazily on first forward — this removes the reference's
``data_dependent_initialize`` two-phase setup; sampling uses explicit
``jax.random`` keys so the whole loss is jittable.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dfmir_tpu.nets.inits import get_initializer


def l2_normalize(x, eps: float = 1e-7):
    """Reference Normalize(2) (networks.py:493-502): x / (||x||_2 + eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


class PatchSampleF(nn.Module):
    feature_dims: Sequence[int]  # input channels of each tapped layer
    nc: int = 256
    use_mlp: bool = True
    init_type: str = "xavier"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, feats, num_patches: int = 256,
                 patch_ids: Optional[List] = None, rng=None):
        """feats: list of (B, *spatial, C). Returns (samples, ids).

        samples[i]: (B * P, nc) L2-normalized projected patches
        (or (B * HW, nc) when num_patches == 0).
        """
        kinit = get_initializer(self.init_type, self.init_gain)
        return_ids = []
        return_feats = []
        for feat_id, feat in enumerate(feats):
            B = feat.shape[0]
            C = feat.shape[-1]
            spatial = feat.shape[1:-1]
            n_loc = 1
            for s in spatial:
                n_loc *= s
            flat = feat.reshape(B, n_loc, C)
            if num_patches > 0:
                if patch_ids is not None:
                    patch_id = patch_ids[feat_id]
                else:
                    if rng is None:
                        raise ValueError("rng required when patch_ids is None")
                    k = jax.random.fold_in(rng, feat_id)
                    patch_id = jax.random.permutation(k, n_loc)[
                        : min(num_patches, n_loc)
                    ]
                x_sample = jnp.take(flat, patch_id, axis=1).reshape(-1, C)
            else:
                patch_id = None
                x_sample = flat.reshape(-1, C)
            if self.use_mlp:
                x_sample = nn.Dense(self.nc, kernel_init=kinit,
                                    bias_init=nn.initializers.zeros_init(),
                                    name=f"mlp_{feat_id}_0")(x_sample)
                x_sample = nn.relu(x_sample)
                x_sample = nn.Dense(self.nc, kernel_init=kinit,
                                    bias_init=nn.initializers.zeros_init(),
                                    name=f"mlp_{feat_id}_1")(x_sample)
            return_ids.append(patch_id)
            x_sample = l2_normalize(x_sample)
            return_feats.append(x_sample)
        return return_feats, return_ids
