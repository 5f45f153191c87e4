"""Flow-field integration and resizing.

- ``vecint``: scaling-and-squaring diffeomorphic integration, semantics of the
  reference VecInt (/root/reference/models/voxelmorph/torchvoxelmorph/layers.py:51-68):
  ``vec *= 1/2**nsteps`` then ``nsteps`` times ``vec = vec + warp(vec, vec)``.
- ``resize_flow``: resize + rescale a displacement field, semantics of
  ResizeTransform (/root/reference/models/voxelmorph/torchvoxelmorph/layers.py:71-97):
  factor < 1 resizes first then scales, factor > 1 scales first then resizes,
  using align_corners=True bi/trilinear interpolation with output size
  ``floor(S * factor)``.

TPU note: align_corners linear resizing is expressed as small dense matmuls
(one per spatial axis), which XLA maps onto the MXU — far cheaper than a
gather-based resampler for the power-of-two shapes used here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dfmir_tpu.ops.warp import warp


def _linear_resize_matrix(n_in: int, n_out: int, dtype=np.float32) -> np.ndarray:
    """(n_out, n_in) align_corners=True linear-interpolation matrix."""
    M = np.zeros((n_out, n_in), dtype=dtype)
    if n_out == 1 or n_in == 1:
        pos = np.zeros(n_out)
    else:
        pos = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, n_in - 1)
    i1 = np.clip(i0 + 1, 0, n_in - 1)
    w = (pos - i0).astype(dtype)
    rows = np.arange(n_out)
    np.add.at(M, (rows, i0), 1.0 - w)
    np.add.at(M, (rows, i1), w)
    return M


def resize_linear(x, out_spatial):
    """Align-corners linear resize of (B, *spatial, C) to out_spatial.

    Matches ``F.interpolate(align_corners=True, mode='bilinear'/'trilinear')``.
    Implemented as per-axis dense matmuls (MXU-friendly).
    """
    spatial = x.shape[1:-1]
    assert len(spatial) == len(out_spatial)
    for axis, (n_in, n_out) in enumerate(zip(spatial, out_spatial)):
        if n_in == n_out:
            continue
        M = jnp.asarray(_linear_resize_matrix(n_in, n_out), dtype=x.dtype)
        x = jnp.moveaxis(x, axis + 1, -1)
        x = x @ M.T
        x = jnp.moveaxis(x, -1, axis + 1)
    return x


@functools.partial(jax.jit, static_argnames=("factor",))
def resize_flow(flow, factor: float):
    """Resize a displacement field and rescale its magnitudes by ``factor``.

    flow: (B, *spatial, nd); output spatial dims are ``floor(S * factor)``.
    """
    if factor == 1.0:
        return flow
    spatial = flow.shape[1:-1]
    out_spatial = tuple(int(s * factor) for s in spatial)
    f = jnp.asarray(factor, flow.dtype)
    if factor < 1:
        flow = resize_linear(flow, out_spatial)
        flow = f * flow
    else:
        flow = f * flow
        flow = resize_linear(flow, out_spatial)
    return flow


@functools.partial(jax.jit, static_argnames=("nsteps", "impl"))
def vecint(vec, nsteps: int = 7, impl: str = "auto"):
    """Integrate a stationary velocity field via scaling and squaring.

    vec: (B, *spatial, nd) velocity field in pixel units.
    Returns the integrated displacement field (same shape).
    """
    assert nsteps >= 0
    vec = vec * (1.0 / (2 ** nsteps))
    # Unrolled: nsteps is small (7) and static; unrolling lets XLA pipeline the
    # serial warp chain without loop-carried layout churn.
    for _ in range(nsteps):
        vec = vec + warp(vec, vec, mode="bilinear", impl=impl)
    return vec
