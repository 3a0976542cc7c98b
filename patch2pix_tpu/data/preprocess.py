"""Host-side image loading / preprocessing (numpy + PIL, channels-last).

Capability parity with /root/reference/utils/datasets/preprocess.py:
``load_im_flexible`` :32, ``load_im_tensor`` :7, ``cal_rescale_size``
:83, ``crop_from_bottom_right`` :62, and the ImageNet-normalising
tuple transforms :93-105 — re-designed for TPU feeding:

  * arrays are HWC float32 (native TPU conv layout), never CHW,
  * eval-time sizes are snapped to multiples of ``upsample * ksize``
    exactly like the reference, which doubles as XLA shape bucketing
    (few distinct compiled shapes per dataset),
  * no torch/torchvision anywhere on this path.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from PIL import Image

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def imagenet_normalize(im: np.ndarray) -> np.ndarray:
    """HWC float32 in [0, 1] -> ImageNet-normalised."""
    return (im - IMAGENET_MEAN) / IMAGENET_STD


def to_array(im: Image.Image, normalize: bool = True) -> np.ndarray:
    """PIL RGB -> HWC float32, scaled to [0,1], optionally normalised."""
    arr = np.asarray(im, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if normalize:
        arr = imagenet_normalize(arr)
    return arr


def load_image(path: str, crop: Optional[Tuple[float, float]] = None) -> Image.Image:
    """Open an RGB image; optionally crop (dw, dh) from bottom-right.

    Crop semantics follow the reference dataset loader
    (/root/reference/utils/datasets/dataset_megadepth.py:29-40): keep
    rows [0, h-dh) and cols [0, w-dw).
    """
    im = Image.open(path).convert("RGB")
    if crop is not None:
        dw, dh = int(crop[0]), int(crop[1])
        if dw or dh:
            im = im.crop((0, 0, im.width - dw, im.height - dh))
    return im


def cal_rescale_size(
    image_size: int, w: int, h: int, k_size: int = 2, upsample: int = 16
) -> Tuple[int, int]:
    """Largest (wt, ht) with max-dim scale ``image_size`` snapped DOWN to
    multiples of ``upsample * k_size``.

    Same arithmetic as the reference
    (/root/reference/utils/datasets/preprocess.py:83-91) with
    ``scale_factor = 1/upsample``.
    """
    unit = upsample * k_size
    s = max(w, h) / image_size
    wt = int(math.floor(w / s / unit)) * unit
    ht = int(math.floor(h / s / unit)) * unit
    return wt, ht


def load_im_flexible(
    path: str,
    k_size: int = 2,
    upsample: int = 16,
    imsize: Optional[int] = None,
) -> Tuple[np.ndarray, Tuple[float, float]]:
    """Load an arbitrary image for matching: resize to the snapped grid.

    Returns (HWC normalised float32, (sx, sy)) where the scale maps
    matches back to original pixels (original / resized, the
    reference's convention at preprocess.py:58).
    """
    im = load_image(path)
    wo, ho = im.width, im.height
    target = imsize if (imsize and imsize > 0) else max(wo, ho)
    target = min(target, max(wo, ho))  # never upsample
    wt, ht = cal_rescale_size(target, wo, ho, k_size, upsample)
    im = im.resize((wt, ht), Image.BICUBIC)
    return to_array(im), (wo / wt, ho / ht)


def load_im_tensor(
    path: str,
    imsize: Optional[int] = None,
    with_gray: bool = False,
):
    """Load + optionally resize to max dim ``imsize``; return normalised
    RGB (and optionally unnormalised gray) + scale.

    Mirrors /root/reference/utils/datasets/preprocess.py:7-30.
    """
    im = Image.open(path).convert("RGB")
    wo, ho = im.width, im.height
    wt, ht = wo, ho
    if imsize and imsize > 0 and max(wo, ho) > imsize:
        s = imsize / max(wo, ho)
        wt, ht = int(round(wo * s)), int(round(ho * s))
        im = im.resize((wt, ht), Image.BICUBIC)
    scale = (wo / wt, ho / ht)
    rgb = to_array(im)
    if with_gray:
        gray = np.asarray(im.convert("L"), dtype=np.float32)[..., None] / 255.0
        return rgb, gray, scale
    return rgb, scale


def crop_from_bottom_right(
    w: int,
    h: int,
    target_ratio: float = 1.5,
    min_ratio: float = 1.3,
    max_ratio: float = 1.7,
) -> Optional[Tuple[float, float]]:
    """Bottom-right crop (dw, dh) bringing aspect w/h to ``target_ratio``.

    Returns None if the aspect is outside [min_ratio, max_ratio]
    (pair rejected). Same even/multiple-of-3 snapping as the reference
    (/root/reference/utils/datasets/preprocess.py:62-81).
    """
    ratio = w / h
    if ratio < min_ratio or ratio > max_ratio:
        return None
    if ratio == target_ratio:
        return 0.0, 0.0
    if ratio > target_ratio:
        dh = h % 2
        ht = h - dh
        dw = w - ht * target_ratio
    else:
        dw = w % 3
        wt = w - dw
        dh = h - wt / target_ratio
    return dw, dh


def scale_intrinsic(K: np.ndarray, wi: int, hi: int, wt: int, ht: int) -> np.ndarray:
    """Rescale a 3x3 intrinsic matrix for an (wi, hi) -> (wt, ht) resize."""
    S = np.diag([wt / wi, ht / hi, 1.0])
    return S @ K
