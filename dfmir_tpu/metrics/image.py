"""Image-similarity evaluation metrics (capability of the reference's
DeepSim / standalone-NCC metric surface, /root/reference/util/
loss_metrics.py:9-118).

``deepsim`` is the cosine similarity of deep features.  The reference uses
an ImageNet-pretrained VGG19; pretrained weights are an external artifact,
so the extractor here is pluggable: pass any callable ``(B, *spatial, C) ->
list of feature maps`` — e.g. the translation generator's ``encode_only``
taps, which are domain-trained features and run on-device.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import numpy as np

import jax.numpy as jnp


def ncc_metric(a, b, eps: float = 1e-8) -> float:
    """Global (whole-image) normalized cross-correlation in [-1, 1]."""
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    a = a - a.mean()
    b = b - b.mean()
    denom = np.sqrt((a * a).sum() * (b * b).sum()) + eps
    return float((a * b).sum() / denom)


def psnr(a, b, data_range: float = 2.0) -> float:
    """Peak signal-to-noise ratio (default range 2.0: images in [-1, 1])."""
    mse = float(np.mean(np.square(np.asarray(a, np.float64)
                                  - np.asarray(b, np.float64))))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range ** 2 / mse))


def deepsim(a, b, extractor: Callable[..., Sequence],
            eps: float = 1e-8) -> float:
    """Mean cosine similarity of deep features of ``a`` and ``b``.

    extractor: callable returning a list of (B, *spatial, C) feature maps
    (e.g. ``lambda x: netG.apply(params, x, layers=(4, 8, 12),
    encode_only=True)``).
    """
    feats_a: List = extractor(a)
    feats_b: List = extractor(b)
    sims = []
    for fa, fb in zip(feats_a, feats_b):
        fa = jnp.asarray(fa)
        fb = jnp.asarray(fb)
        num = jnp.sum(fa * fb, axis=-1)
        den = (jnp.linalg.norm(fa, axis=-1)
               * jnp.linalg.norm(fb, axis=-1) + eps)
        sims.append(float(jnp.mean(num / den)))
    return float(np.mean(sims))
