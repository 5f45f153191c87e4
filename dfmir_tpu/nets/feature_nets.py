"""netF variants besides PatchSampleF (capability of
/root/reference/models/networks.py:505-572; selectable via
``--netF global_pool | reshape | strided_conv``).

- PoolingF: global max pool + L2 norm.
- ReshapeF: adaptive 4x4 average pool, flatten locations into batch, L2 norm.
- StridedConvF: per-tapped-layer strided conv stack mapping any (H, C) to a
  32x-ish 64-channel map, with an EMA-centered output.  The reference builds
  these lazily per observed shape; here the stack is declared from static
  per-layer (channels, size) specs, and the EMA lives in a flax ``stats``
  variable collection (mutable during training).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from dfmir_tpu.nets.inits import get_initializer
from dfmir_tpu.nets.layers import ConvND, instance_norm
from dfmir_tpu.nets.patch_sample import l2_normalize


def _adaptive_pool(x, out_size: int, reduce_fn):
    """torch AdaptiveMax/AvgPool2d for (B, H, W, C), H % out == 0 fast path,
    general torch bin split otherwise."""
    B, H, W, C = x.shape
    out = jnp.zeros((B, out_size, out_size, C), x.dtype)
    rows = [(int(np.floor(i * H / out_size)), int(np.ceil((i + 1) * H / out_size)))
            for i in range(out_size)]
    cols = [(int(np.floor(j * W / out_size)), int(np.ceil((j + 1) * W / out_size)))
            for j in range(out_size)]
    parts = []
    for r0, r1 in rows:
        row = [reduce_fn(x[:, r0:r1, c0:c1, :], axis=(1, 2)) for c0, c1 in cols]
        parts.append(jnp.stack(row, axis=1))
    return jnp.stack(parts, axis=1)


class PoolingF(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = jnp.max(x, axis=(1, 2), keepdims=True)
        return l2_normalize(h)


class ReshapeF(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = _adaptive_pool(x, 4, jnp.mean)
        h = h.reshape(-1, h.shape[-1])
        return l2_normalize(h)


class StridedConvF(nn.Module):
    """specs: per tapped layer (channels, spatial_size)."""

    specs: Sequence[Tuple[int, int]]
    init_type: str = "normal"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, feats, use_instance_norm: bool = False,
                 update_ema: bool = True):
        outs = []
        for i, (feat, (C, H)) in enumerate(zip(feats, self.specs)):
            n_down = max(int(np.rint(np.log2(H / 32))), 0)
            h = feat
            ch = C
            for d in range(n_down):
                ch = max(ch // 2, 64)
                h = ConvND(ch, kernel=3, stride=2, padding=0,
                           init_type=self.init_type,
                           init_gain=self.init_gain,
                           name=f"conv_{i}_{d}")(h)
                h = nn.relu(h)
            h = ConvND(64, kernel=3, stride=1, padding=0,
                       init_type=self.init_type, init_gain=self.init_gain,
                       name=f"conv_{i}_out")(h)
            ema = self.variable("stats", f"ema_{i}",
                                lambda: jnp.zeros(h.shape[1:], h.dtype))
            if update_ema and not self.is_initializing():
                ema.value = ema.value * 0.999 + jnp.mean(h, axis=0) * 0.001
            h = h - ema.value
            if use_instance_norm:
                h = instance_norm(h)
            outs.append(l2_normalize(h))
        return outs
