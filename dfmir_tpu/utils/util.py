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


def correct_resize(arr, size, method=Image.BICUBIC) -> np.ndarray:
    """PIL-quality resize of a (B,H,W,C) [-1,1] batch to ``size`` (w, h)
    (reference util.correct_resize, util/util.py:157-166)."""
    arr = np.asarray(arr, np.float32)
    out = []
    for i in range(arr.shape[0]):
        img = Image.fromarray(tensor2im(arr[i]))
        resized = np.asarray(img.resize(size, method), np.float32) / 255.0
        out.append(resized * 2.0 - 1.0)
    res = np.stack(out)
    if arr.shape[-1] == 1:
        res = res.mean(axis=-1, keepdims=True)
    return res


def correct_resize_label(arr, size) -> np.ndarray:
    """Nearest-neighbor PIL resize of a (B,H,W[,1]) integer label batch
    (reference util.correct_resize_label, util/util.py:143-154)."""
    arr = np.asarray(arr)
    out = []
    for i in range(arr.shape[0]):
        lab = arr[i, ..., 0] if arr.ndim == 4 else arr[i]
        img = Image.fromarray(lab.astype(np.uint8))
        out.append(np.asarray(img.resize(size, Image.NEAREST), np.int64))
    return np.stack(out)


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
