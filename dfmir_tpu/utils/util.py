"""Small host-side helpers (capability of /root/reference/util/util.py:13-166).
"""

from __future__ import annotations

import argparse
import os
from typing import Iterable, Union

import numpy as np
from PIL import Image


def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def copyconf(default_opt, **kwargs):
    conf = argparse.Namespace(**vars(default_opt))
    for key, val in kwargs.items():
        setattr(conf, key, val)
    return conf


def mkdirs(paths: Union[str, Iterable[str]]) -> None:
    if isinstance(paths, str):
        paths = [paths]
    for p in paths:
        os.makedirs(p, exist_ok=True)


def tensor2im(arr, imtype=np.uint8) -> np.ndarray:
    """(B,H,W,C) or (H,W,C) array in [-1,1] -> HWC uint8 RGB
    (reference util.tensor2im, util/util.py:24-47)."""
    arr = np.asarray(arr, dtype=np.float32)
    if arr.ndim == 4:
        arr = arr[0]
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    img = (arr + 1.0) / 2.0 * 255.0
    return np.clip(img, 0, 255).astype(imtype)


def save_image(image_numpy: np.ndarray, image_path: str,
               aspect_ratio: float = 1.0) -> None:
    pil = Image.fromarray(image_numpy)
    h, w = image_numpy.shape[0], image_numpy.shape[1]
    if aspect_ratio is not None and aspect_ratio != 1.0:
        if aspect_ratio > 1.0:
            pil = pil.resize((int(w * aspect_ratio), h), Image.BICUBIC)
        else:
            pil = pil.resize((w, int(h / aspect_ratio)), Image.BICUBIC)
    pil.save(image_path)
