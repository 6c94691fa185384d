"""Image degradation pipeline for super-resolution training.

Light-weight equivalent of the vendored BSRGAN pipelines
(ldm/modules/image_degradation/, ~2.3k LoC of cv2 code used only by the
ImageNet-SR path): composable blur / downsample / noise / JPEG
degradations over [0,1] float images, orchestrated in random order like
bsrgan's degradation_bsrgan.  cv2 is available in this image; PIL handles
JPEG round-trips."""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["degradation_pipeline", "gaussian_blur", "random_noise", "jpeg_compress", "downsample_up"]


def gaussian_blur(img: np.ndarray, rng: np.random.Generator, sigma_range=(0.2, 2.0)) -> np.ndarray:
    import cv2

    sigma = float(rng.uniform(*sigma_range))
    k = max(3, int(sigma * 4) | 1)
    return cv2.GaussianBlur(img, (k, k), sigma).reshape(img.shape)


def random_noise(img: np.ndarray, rng: np.random.Generator, sigma_range=(0.0, 0.1)) -> np.ndarray:
    sigma = float(rng.uniform(*sigma_range))
    return np.clip(img + rng.normal(0, sigma, img.shape).astype(np.float32), 0, 1)


def jpeg_compress(img: np.ndarray, rng: np.random.Generator, quality_range=(30, 95)) -> np.ndarray:
    import cv2

    q = int(rng.integers(*quality_range))
    u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    ok, enc = cv2.imencode(".jpg", u8, [cv2.IMWRITE_JPEG_QUALITY, q])
    dec = cv2.imdecode(enc, cv2.IMREAD_UNCHANGED)
    return (dec.astype(np.float32) / 255.0).reshape(img.shape)


def downsample_up(img: np.ndarray, rng: np.random.Generator, scale_range=(1.5, 4.0)) -> np.ndarray:
    import cv2

    s = float(rng.uniform(*scale_range))
    h, w = img.shape[:2]
    small = cv2.resize(img, (max(1, int(w / s)), max(1, int(h / s))), interpolation=cv2.INTER_AREA)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR).reshape(img.shape)


def degradation_pipeline(
    img: np.ndarray,
    rng: np.random.Generator,
    sf: int = 4,
    stages: Optional[Sequence[Callable]] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """HR [0,1] (H, W, C) -> (LR degraded at H/sf, HR).  Random stage order
    (bsrgan-style shuffle)."""
    import cv2

    stages = list(stages or (gaussian_blur, downsample_up, random_noise, jpeg_compress))
    rng.shuffle(stages)
    lr = img.astype(np.float32)
    for f in stages:
        lr = f(lr, rng)
    h, w = img.shape[:2]
    lr = cv2.resize(lr, (w // sf, h // sf), interpolation=cv2.INTER_AREA).reshape(
        (h // sf, w // sf) + img.shape[2:]
    )
    return lr, img
