"""Recursive image-directory walk (capability of
/root/reference/data/image_folder.py:13-66): collect image files under a
root, sorted walk, extension-filtered, capped at ``max_dataset_size``.
"""

from __future__ import annotations

import os
from typing import List, Optional

IMG_EXTENSIONS = (
    ".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".tif", ".tiff",
)


def is_image_file(filename: str) -> bool:
    return filename.lower().endswith(IMG_EXTENSIONS)


def make_dataset(directory: str,
                 max_dataset_size: Optional[float] = None) -> List[str]:
    if not (os.path.isdir(directory) or os.path.islink(directory)):
        raise NotADirectoryError(f"{directory} is not a valid directory")
    images = []
    for root, _, fnames in sorted(os.walk(directory, followlinks=True)):
        for fname in sorted(fnames):
            if is_image_file(fname):
                images.append(os.path.join(root, fname))
    if max_dataset_size is not None and max_dataset_size != float("inf"):
        images = images[: int(max_dataset_size)]
    return images


# ---------------------------------------------------------------- cache
# Decoded-image cache: epochs re-read the same files, and PIL decode
# dominates host data time on small datasets (flips/crops happen AFTER
# retrieval and never mutate the cached image — PIL ops return copies).
# Byte-capped, insert-only (training sets are re-visited uniformly, so
# eviction buys nothing); thread-safe under the GIL.
_CACHE: dict = {}
_CACHE_BYTES = [0]


def load_image(path: str, grayscale: bool = True, cache_mb: float = 0):
    """Open (and optionally grayscale-convert) an image, caching the
    decoded result up to ``cache_mb`` total megabytes (0 = no caching)."""
    from PIL import Image

    key = (path, grayscale)
    img = _CACHE.get(key)
    if img is not None:
        return img
    img = Image.open(path)
    if grayscale and img.mode != "L":
        img = img.convert("L")
    else:
        img.load()  # force decode so the cached object is not lazy
    if cache_mb:
        nbytes = img.size[0] * img.size[1] * len(img.getbands())
        if _CACHE_BYTES[0] + nbytes <= cache_mb * (1 << 20):
            _CACHE[key] = img
            _CACHE_BYTES[0] += nbytes
    return img
