"""Jacobian-determinant maps for deformation fields.

The reference ships only a visualization colormap for |J| maps
(/root/reference/util/jac_vis.py:7-43) and never computes the determinant;
BASELINE.json requires the %|J|<0 folding metric, so this module provides it.

``flow`` is a displacement field (B, *spatial, nd) in pixel units; the mapping
is ``phi(p) = p + flow(p)``.  Derivatives use central differences in the
interior and one-sided differences at the edges (numpy.gradient convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gradient(u, axis):
    """d u / d axis with unit spacing; central interior, one-sided edges."""
    n = u.shape[axis]
    if n < 2:
        return jnp.zeros_like(u)

    def sl(a, b):
        idx = [slice(None)] * u.ndim
        idx[axis] = slice(a, b)
        return tuple(idx)

    interior = (u[sl(2, None)] - u[sl(None, -2)]) * 0.5
    first = u[sl(1, 2)] - u[sl(0, 1)]
    last = u[sl(-1, None)] - u[sl(-2, -1)]
    return jnp.concatenate([first, interior, last], axis=axis)


@jax.jit
def jacobian_det(flow):
    """Pointwise determinant of the deformation Jacobian, (B, *spatial)."""
    nd = flow.shape[-1]
    spatial_axes = range(1, 1 + nd)
    # grad[i][j] = d flow_i / d axis_j
    grad = [
        [_gradient(flow[..., i], axis) for axis in spatial_axes]
        for i in range(nd)
    ]
    eye = lambda i, j: 1.0 if i == j else 0.0
    J = [[grad[i][j] + eye(i, j) for j in range(nd)] for i in range(nd)]
    if nd == 1:
        return J[0][0]
    if nd == 2:
        return J[0][0] * J[1][1] - J[0][1] * J[1][0]
    if nd == 3:
        return (
            J[0][0] * (J[1][1] * J[2][2] - J[1][2] * J[2][1])
            - J[0][1] * (J[1][0] * J[2][2] - J[1][2] * J[2][0])
            + J[0][2] * (J[1][0] * J[2][1] - J[1][1] * J[2][0])
        )
    raise ValueError(f"unsupported ndims={nd}")


@jax.jit
def folding_fraction(flow):
    """%|J|<0 — fraction of voxels where the deformation folds, per batch."""
    det = jacobian_det(flow)
    nd = flow.shape[-1]
    return jnp.mean((det < 0).astype(jnp.float32), axis=tuple(range(1, 1 + nd)))
