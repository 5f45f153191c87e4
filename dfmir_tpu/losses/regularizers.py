"""Flow regularizers.

- ``smoothness_loss``: the paper model's 2-D flow smoothness
  (/root/reference/models/registration_model.py:25-32):
  (mean(dx^2) + mean(dy^2)) / 2 over finite differences of the *integrated*
  full-res flow.  Generalized to N-D (mean over per-axis mean square diffs).
- ``grad_loss``: reference Grad_Loss l1/l2 2-D/3-D
  (/root/reference/util/losses.py:81-130).

Flows are (B, *spatial, nd).
"""

from __future__ import annotations

import jax.numpy as jnp


def _axis_diff(y, axis):
    nd = y.ndim
    idx_hi = [slice(None)] * nd
    idx_lo = [slice(None)] * nd
    idx_hi[axis] = slice(1, None)
    idx_lo[axis] = slice(None, -1)
    return y[tuple(idx_hi)] - y[tuple(idx_lo)]


def smoothness_loss(flow):
    """Mean squared finite difference, averaged over spatial axes."""
    nd = flow.shape[-1]
    total = 0.0
    for axis in range(1, 1 + nd):
        d = jnp.abs(_axis_diff(flow, axis))
        total = total + jnp.mean(d * d)
    return total / nd


def grad_loss(flow, penalty: str = "l2"):
    nd = flow.shape[-1]
    total = 0.0
    for axis in range(1, 1 + nd):
        d = jnp.abs(_axis_diff(flow, axis))
        if penalty == "l2":
            d = d * d
        total = total + jnp.mean(d)
    return total / nd
