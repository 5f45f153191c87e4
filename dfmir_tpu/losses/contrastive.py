"""SimCLR-style NT-Xent contrastive loss and 3-D smoothness (capability of
the reference's util/networks_contrastive_learning.py:67-153 side library).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nt_xent_loss(z_i, z_j, temperature: float = 0.5,
                 use_cosine_similarity: bool = True):
    """NT-Xent over two views: z_i, z_j (B, D).  Positives are the paired
    views; negatives are every other sample in the 2B batch.  Returns the
    summed cross entropy / (2B) (reference contrastive_loss semantics)."""
    B = z_i.shape[0]
    z = jnp.concatenate([z_i, z_j], axis=0)  # (2B, D)
    if use_cosine_similarity:
        z_n = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-8)
        sim = z_n @ z_n.T
    else:
        sim = z @ z.T
    sim = sim / temperature
    n = 2 * B
    # mask self-similarity
    mask = jnp.eye(n, dtype=bool)
    sim = jnp.where(mask, -jnp.inf, sim)
    # positive of i is i+B (mod 2B)
    pos_idx = jnp.concatenate([jnp.arange(B) + B, jnp.arange(B)])
    logp = jax.nn.log_softmax(sim, axis=-1)
    loss = -logp[jnp.arange(n), pos_idx]
    return jnp.sum(loss) / n


def smooth_loss_3d(flow, penalty: str = "l2"):
    """Mean finite-difference penalty over three spatial axes / 3
    (reference smooth_loss, networks_contrastive_learning.py:67-82).
    flow: (B, D, H, W, C)."""
    d = 0.0
    for axis in (1, 2, 3):
        diff = jnp.abs(jnp.diff(flow, axis=axis))
        if penalty == "l2":
            diff = diff * diff
        d = d + jnp.mean(diff)
    return d / 3.0
