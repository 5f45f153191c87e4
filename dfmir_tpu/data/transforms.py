"""Host-side image preprocessing producing NHWC float32 arrays in [-1, 1].

Capability parity with the reference transform chain
(/root/reference/data/base_dataset.py:66-230): grayscale -> one of
resize / scale_width / scale_shortside / fixsize -> optional zoom ->
crop / patch / trim -> make-power-of-2(base 4) -> flip -> to-array +
normalize((0.5,), (0.5,)).

TPU-first deltas: output is channels-last numpy (the device layout), the
random parameters are drawn from an explicit ``numpy.random.Generator``
(reproducible, no process-global RNG), and the whole chain is a plain
function — no torchvision Compose objects.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
from PIL import Image


@dataclasses.dataclass
class TransformParams:
    """Pre-drawn random parameters so A/B (or image/label) pairs can share
    the same crop/flip (reference get_params, base_dataset.py:66-79)."""

    crop_pos: Tuple[int, int] = (0, 0)
    flip: bool = False
    scale_factor: Optional[Tuple[float, float]] = None
    patch_index: int = 0


def get_params(opt, size: Tuple[int, int],
               rng: Optional[np.random.Generator] = None) -> TransformParams:
    rng = rng or np.random.default_rng()
    w, h = size
    new_w, new_h = w, h
    if opt.preprocess == "resize_and_crop":
        new_w = new_h = opt.load_size
    elif opt.preprocess == "scale_width_and_crop":
        new_w = opt.load_size
        new_h = opt.load_size * h // w
    x = int(rng.integers(0, max(0, new_w - opt.crop_size) + 1))
    y = int(rng.integers(0, max(0, new_h - opt.crop_size) + 1))
    flip = bool(rng.random() > 0.5)
    zoom = tuple(rng.uniform(0.8, 1.0, size=2)) if "zoom" in opt.preprocess \
        else None
    return TransformParams(crop_pos=(x, y), flip=flip, scale_factor=zoom)


def _scale_width(img, target_width, crop_width, method):
    ow, oh = img.size
    if ow == target_width and oh >= crop_width:
        return img
    h = int(max(target_width * oh / ow, crop_width))
    return img.resize((target_width, h), method)


def _scale_shortside(img, target_width, method):
    ow, oh = img.size
    if min(ow, oh) >= target_width:
        return img
    scale = target_width / min(ow, oh)
    return img.resize((round(ow * scale), round(oh * scale)), method)


def _zoom(img, crop_width, factor, method):
    iw, ih = img.size
    zw = max(crop_width, iw * factor[0])
    zh = max(crop_width, ih * factor[1])
    return img.resize((int(round(zw)), int(round(zh))), method)


def _crop(img, pos, size):
    ow, oh = img.size
    x1, y1 = pos
    if ow > size or oh > size:
        return img.crop((x1, y1, x1 + size, y1 + size))
    return img


def _patch(img, index, size, rng):
    ow, oh = img.size
    nw, nh = ow // size, oh // size
    startx = int(rng.integers(0, ow - nw * size + 1))
    starty = int(rng.integers(0, oh - nh * size + 1))
    index = index % (nw * nh)
    ix, iy = index // nh, index % nh
    gx, gy = startx + ix * size, starty + iy * size
    return img.crop((gx, gy, gx + size, gy + size))


def _trim(img, trim_width, rng):
    ow, oh = img.size
    xs = int(rng.integers(0, ow - trim_width)) if ow > trim_width else 0
    ys = int(rng.integers(0, oh - trim_width)) if oh > trim_width else 0
    return img.crop((xs, ys, min(xs + trim_width, ow),
                     min(ys + trim_width, oh)))


def _make_power_2(img, base, method):
    ow, oh = img.size
    w = int(round(ow / base) * base)
    h = int(round(oh / base) * base)
    if w == ow and h == oh:
        return img
    return img.resize((w, h), method)


def to_array(img: Image.Image, grayscale: bool = True) -> np.ndarray:
    """PIL -> HWC float32 in [-1, 1] (ToTensor + Normalize(0.5, 0.5))."""
    arr = np.asarray(img, dtype=np.float32)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    arr = arr / 255.0
    return arr * 2.0 - 1.0


def apply_transform(opt, img: Image.Image,
                    params: Optional[TransformParams] = None,
                    grayscale: bool = True,
                    method=Image.BICUBIC,
                    convert: bool = True,
                    rng: Optional[np.random.Generator] = None,
                    out_dtype: str = "float32"):
    """The full reference chain; returns HWC float32 in [-1,1] (or the PIL
    image if convert=False, for label maps warped with nearest).

    out_dtype="uint8" skips the final normalize and returns the raw HWC
    uint8 pixels: the whole chain is PIL-native (uint8 end to end), so
    shipping 1 byte/px to the device and applying the normalize there
    matches the float path to 1 ulp while cutting host->device bytes 4x."""
    rng = rng or np.random.default_rng()
    pre = opt.preprocess
    if grayscale and img.mode != "L":
        img = img.convert("L")
    if "fixsize" in pre:
        img = img.resize((opt.crop_size, opt.crop_size), method)
    if "resize" in pre:
        img = img.resize((opt.load_size, opt.load_size), method)
    elif "scale_width" in pre:
        img = _scale_width(img, opt.load_size, opt.crop_size, method)
    elif "scale_shortside" in pre:
        img = _scale_shortside(img, opt.load_size, method)
    if "zoom" in pre:
        factor = params.scale_factor if params and params.scale_factor \
            else tuple(rng.uniform(0.8, 1.0, size=2))
        img = _zoom(img, opt.crop_size, factor, method)
    if "crop" in pre:
        if params is None:
            ow, oh = img.size
            x = int(rng.integers(0, max(0, ow - opt.crop_size) + 1))
            y = int(rng.integers(0, max(0, oh - opt.crop_size) + 1))
            img = _crop(img, (x, y), opt.crop_size)
        else:
            img = _crop(img, params.crop_pos, opt.crop_size)
    if "patch" in pre:
        img = _patch(img, params.patch_index if params else 0,
                     opt.crop_size, rng)
    if "trim" in pre:
        img = _trim(img, opt.crop_size, rng)
    img = _make_power_2(img, base=4, method=method)
    if not getattr(opt, "no_flip", False):
        flip = params.flip if params is not None else bool(rng.random() > 0.5)
        if flip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
    if not convert:
        return img
    if out_dtype == "uint8":
        arr = np.asarray(img, dtype=np.uint8)
        return arr[:, :, None] if arr.ndim == 2 else arr
    return to_array(img, grayscale)
