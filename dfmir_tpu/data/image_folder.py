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
