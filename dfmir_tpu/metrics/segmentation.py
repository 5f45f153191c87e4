"""Segmentation-overlap evaluation metrics (capability of the reference's
shipped-but-dead evaluation surface: Dice in /root/reference/util/losses.py:
350-397 + torchvoxelmorph/losses.py:79-90, Hausdorff via scipy EDT in
util/loss_metrics.py:120-159).

Host-side numpy (evaluation is offline); inputs are integer label maps of
any dimensionality.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def dice_score(a: np.ndarray, b: np.ndarray) -> float:
    """Hard Dice of two binary masks."""
    a = np.asarray(a).astype(bool)
    b = np.asarray(b).astype(bool)
    denom = a.sum() + b.sum()
    if denom == 0:
        return 1.0
    return float(2.0 * np.logical_and(a, b).sum() / denom)


def label_dice(pred: np.ndarray, target: np.ndarray,
               labels: Optional[Sequence[int]] = None) -> dict:
    """Per-label hard Dice between two integer label maps."""
    pred = np.asarray(pred)
    target = np.asarray(target)
    if labels is None:
        labels = sorted(set(np.unique(pred)) | set(np.unique(target)))
        labels = [l for l in labels if l != 0]
    return {int(l): dice_score(pred == l, target == l) for l in labels}


def hausdorff_distance(a: np.ndarray, b: np.ndarray,
                       percentile: Optional[float] = None) -> float:
    """(Percentile-)Hausdorff distance between two binary masks via
    Euclidean distance transforms (reference HausdorffDistance,
    util/loss_metrics.py:120-159).  percentile=95 gives HD95."""
    from scipy.ndimage import distance_transform_edt

    a = np.asarray(a).astype(bool)
    b = np.asarray(b).astype(bool)
    if not a.any() or not b.any():
        return float("inf") if a.any() != b.any() else 0.0
    dt_a = distance_transform_edt(~a)
    dt_b = distance_transform_edt(~b)
    d_ab = dt_b[a]  # distance from each a-voxel to b
    d_ba = dt_a[b]
    if percentile is not None:
        return float(max(np.percentile(d_ab, percentile),
                         np.percentile(d_ba, percentile)))
    return float(max(d_ab.max(), d_ba.max()))
