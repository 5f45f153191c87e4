"""PatchNCE (InfoNCE over sampled patches).

Mirrors the reference PatchNCELoss (/root/reference/models/patchnce.py:14-55):
positive logit = <q_i, k_i>; negatives = per-image q @ k^T with the diagonal
masked to -10; logits / T; cross-entropy against class 0 (reduction 'none' —
the caller means over patches).  ``feat_k`` is gradient-stopped (the key
encoder is not updated through this loss).

Shapes: feat_q / feat_k are (B * P, dim) with P patches per image;
``batch_size`` is the number of images (the reference uses opt.batch_size;
``nce_includes_all_negatives_from_minibatch`` folds everything into one).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def patch_nce_loss(feat_q, feat_k, nce_T: float = 0.07, batch_size: int = 1,
                   all_negatives_from_minibatch: bool = False):
    """Per-patch InfoNCE loss, shape (B * P,)."""
    dim = feat_q.shape[-1]
    feat_k = jax.lax.stop_gradient(feat_k)

    l_pos = jnp.sum(feat_q * feat_k, axis=-1, keepdims=True)  # (N, 1)

    b = 1 if all_negatives_from_minibatch else batch_size
    q = feat_q.reshape(b, -1, dim)
    k = feat_k.reshape(b, -1, dim)
    npatches = q.shape[1]
    # (b, P, P) similarity; bf16-safe accumulate in f32 on the MXU
    l_neg = jnp.einsum("bpd,bqd->bpq", q, k,
                       preferred_element_type=jnp.float32).astype(feat_q.dtype)
    eye = jnp.eye(npatches, dtype=bool)
    l_neg = jnp.where(eye[None], jnp.asarray(-10.0, l_neg.dtype), l_neg)
    l_neg = l_neg.reshape(-1, npatches)

    logits = jnp.concatenate([l_pos, l_neg], axis=1) / nce_T
    # cross-entropy with target class 0
    logz = jax.nn.logsumexp(logits, axis=1)
    return logz - logits[:, 0]
