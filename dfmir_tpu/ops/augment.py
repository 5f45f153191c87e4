"""Random spatial-deformation augmentation, jittable (capability of the
reference's TensorDeformation engine — random affine + low-resolution SVF —
/root/reference/util/tensor_utils.py:10-60 and the nonlinear/rotation/affine
parameter samplers in util/image_transforms.py:57-256).

All randomness flows through explicit jax PRNG keys; the composed warp is a
single dense flow so one gather augments the image (and the same flow can
warp the paired label map with nearest mode).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from dfmir_tpu.ops.affine import centered_affine
from dfmir_tpu.ops.integrate import resize_linear, vecint
from dfmir_tpu.ops.warp import identity_grid, warp


def random_affine_matrix(key, batch: int, spatial: Sequence[int],
                         max_rotation: float = 10.0,
                         max_scaling: float = 0.1,
                         max_translation: float = 5.0):
    """Sample centered affine matrices: per-axis rotation (degrees), scaling
    (1 +- max_scaling), translation (pixels).  2-D or 3-D."""
    nd = len(spatial)
    k_rot, k_scale, k_trans = jax.random.split(key, 3)
    n_rot = 1 if nd == 2 else 3
    angles = jax.random.uniform(k_rot, (batch, n_rot),
                                minval=-max_rotation, maxval=max_rotation)
    angles = angles * (jnp.pi / 180.0)
    scales = 1.0 + jax.random.uniform(k_scale, (batch, nd),
                                      minval=-max_scaling,
                                      maxval=max_scaling)
    trans = jax.random.uniform(k_trans, (batch, nd),
                               minval=-max_translation,
                               maxval=max_translation)

    def rot2(a):
        c, s = jnp.cos(a), jnp.sin(a)
        return jnp.stack([jnp.stack([c, -s], -1),
                          jnp.stack([s, c], -1)], -2)

    if nd == 2:
        lin = rot2(angles[:, 0])
    else:
        def rot3(a, axis):
            c, s = jnp.cos(a), jnp.sin(a)
            one = jnp.ones_like(a)
            zero = jnp.zeros_like(a)
            rows = {
                0: [[one, zero, zero], [zero, c, -s], [zero, s, c]],
                1: [[c, zero, s], [zero, one, zero], [-s, zero, c]],
                2: [[c, -s, zero], [s, c, zero], [zero, zero, one]],
            }[axis]
            return jnp.stack([jnp.stack(r, -1) for r in rows], -2)

        lin = rot3(angles[:, 0], 0) @ rot3(angles[:, 1], 1) \
            @ rot3(angles[:, 2], 2)
    lin = lin * scales[:, None, :]
    return centered_affine(spatial, lin, trans)


def random_svf_flow(key, batch: int, spatial: Sequence[int],
                    svf_std: float = 1.0, svf_scale: int = 8,
                    int_steps: int = 5):
    """Smooth random diffeomorphic flow: gaussian SVF sampled at
    (spatial / svf_scale), integrated by scaling-and-squaring, upsampled."""
    nd = len(spatial)
    low = tuple(max(s // svf_scale, 2) for s in spatial)
    svf = jax.random.normal(key, (batch,) + low + (nd,)) * svf_std
    svf = vecint(svf, int_steps)
    flow = resize_linear(svf, tuple(spatial))
    scale = jnp.asarray([spatial[i] / low[i] for i in range(nd)],
                        flow.dtype)
    return flow * scale


def random_deformation(key, batch: int, spatial: Sequence[int],
                       max_rotation: float = 10.0,
                       max_scaling: float = 0.1,
                       max_translation: float = 5.0,
                       svf_std: float = 1.0, svf_scale: int = 8,
                       int_steps: int = 5):
    """Compose random affine and random SVF into ONE dense flow:
    total(p) = affine(p + svf(p)) - p, so a single gather applies both."""
    k_aff, k_svf = jax.random.split(key)
    matrix = random_affine_matrix(key=k_aff, batch=batch, spatial=spatial,
                                  max_rotation=max_rotation,
                                  max_scaling=max_scaling,
                                  max_translation=max_translation)
    flow_svf = random_svf_flow(k_svf, batch, spatial, svf_std=svf_std,
                               svf_scale=svf_scale, int_steps=int_steps)
    grid = identity_grid(spatial)[None]
    coords = grid + flow_svf  # p + svf(p)
    nd = len(spatial)
    lin = matrix[:, :, :nd]
    off = matrix[:, :, nd]
    coords = (jnp.einsum("b...j,bij->b...i", coords, lin)
              + off.reshape((-1,) + (1,) * nd + (nd,)))
    return coords - grid


def augment(src, key, label=None, **kwargs):
    """Random-deform ``src`` (bilinear) and optionally its label map
    (nearest) with the same flow.  Returns (aug, flow) or (aug, lab, flow)."""
    flow = random_deformation(key, src.shape[0], src.shape[1:-1], **kwargs)
    out = warp(src, flow)
    if label is None:
        return out, flow
    lab = warp(label, flow, mode="nearest")
    return out, lab, flow
