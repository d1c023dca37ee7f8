"""Image transforms on numpy arrays (HWC uint8/float), PIL-backed decode.

Replaces the reference's torchvision/albumentations pipelines
(reference: enhancing/dataloader/imagenet.py:24-38, coco.py:36-58) without the
torchvision dependency. All functions take/return HWC numpy arrays; the
output convention is float32 in [0, 1], channels last (TPU layout).

A native (C++) fast path for decode+resize lives in native/; these numpy
versions are the reference implementations and the fallback.
"""
from __future__ import annotations

import random
from typing import Optional, Tuple

import numpy as np
from PIL import Image

Image.MAX_IMAGE_PIXELS = None


def load_image(path: str) -> np.ndarray:
    """Decode to RGB uint8 HWC.

    JPEG/PNG go through the native libjpeg/libpng decoder (native/
    image_ops.cpp) when built; anything else (webp, corrupt headers)
    falls back to PIL."""
    from . import native
    if native.has_decoders():
        try:
            with open(path, "rb") as f:
                return native.decode_image(f.read())
        except ValueError:
            pass
    with Image.open(path) as img:
        return np.asarray(img.convert("RGB"))


def resize(img: np.ndarray, size: int, interpolation=Image.BILINEAR
           ) -> np.ndarray:
    """Resize shorter side to ``size`` keeping aspect (torchvision semantics)."""
    h, w = img.shape[:2]
    if h < w:
        nh, nw = size, max(1, round(w * size / h))
    else:
        nh, nw = max(1, round(h * size / w)), size
    if (nh, nw) == (h, w):
        return img
    pil = Image.fromarray(img if img.dtype == np.uint8
                          else (img * 255).astype(np.uint8))
    return np.asarray(pil.resize((nw, nh), interpolation))


def resize_exact(img: np.ndarray, hw: Tuple[int, int],
                 interpolation=Image.BICUBIC) -> np.ndarray:
    pil = Image.fromarray(img if img.dtype == np.uint8
                          else (img * 255).astype(np.uint8))
    return np.asarray(pil.resize((hw[1], hw[0]), interpolation))


def center_crop(img: np.ndarray, size: int) -> np.ndarray:
    h, w = img.shape[:2]
    top = max(0, (h - size) // 2)
    left = max(0, (w - size) // 2)
    return img[top:top + size, left:left + size]


def random_crop(img: np.ndarray, size: int,
                rng: Optional[random.Random] = None) -> np.ndarray:
    h, w = img.shape[:2]
    r = rng or random
    top = r.randint(0, max(0, h - size))
    left = r.randint(0, max(0, w - size))
    return img[top:top + size, left:left + size]


def random_hflip(img: np.ndarray, p: float = 0.5,
                 rng: Optional[random.Random] = None) -> np.ndarray:
    r = rng or random
    if r.random() < p:
        return img[:, ::-1]
    return img


def to_float(img: np.ndarray) -> np.ndarray:
    if img.dtype == np.uint8:
        return (img.astype(np.float32) / 255.0)
    return np.ascontiguousarray(img.astype(np.float32))


class TrainTransform:
    """Resize -> RandomCrop -> HFlip -> float (reference imagenet.py:24-30)."""

    def __init__(self, resolution: int = 256) -> None:
        self.resolution = resolution

    def __call__(self, img: np.ndarray) -> np.ndarray:
        img = resize(img, self.resolution)
        img = random_crop(img, self.resolution)
        img = random_hflip(img)
        return to_float(np.ascontiguousarray(img))


class EvalTransform:
    """Resize -> CenterCrop -> float (reference imagenet.py:32-38)."""

    def __init__(self, resolution: int = 256) -> None:
        self.resolution = resolution

    def __call__(self, img: np.ndarray) -> np.ndarray:
        img = resize(img, self.resolution)
        img = center_crop(img, self.resolution)
        return to_float(np.ascontiguousarray(img))
