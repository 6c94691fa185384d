"""Host-side volume/image transforms (numpy).

Re-specification of the reference's preprocessing without torchio /
torchvision:
  * `window_norm` — CT windowing, default W=360 L=60
    (ldm/data/ruijin_pimage_and_mask.py:39-44, ccdm/datasets/ruijin.py:41-45);
  * `resize_volume` — torchio Resize equivalent (nearest for labels,
    linear for images) via jax.image on host arrays;
  * `crop_or_pad` — torchio CropOrPad equivalent (ldm/data/ruijin.py:208-256);
  * flips/scale/crop used by the 2D pipeline
    (ccdm/datasets/pipelines/transforms.py:17-445).

All functions take and return numpy; device placement happens in the
loader so I/O overlaps compute.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "window_norm",
    "resize_volume",
    "crop_or_pad",
    "random_flip",
    "one_hot_np",
]


def window_norm(image: np.ndarray, window_pos: float = 60.0, window_width: float = 360.0) -> np.ndarray:
    """Clamp a HU image into [0,1] over [L-W/2, L+W/2]."""
    lo = window_pos - window_width / 2
    out = (image.astype(np.float32) - lo) / window_width
    return np.clip(out, 0.0, 1.0)


def resize_volume(vol: np.ndarray, target: Sequence[int], method: str = "linear") -> np.ndarray:
    """Resize a (D, H, W) or (D, H, W, C) array. 'nearest' for labels."""
    import jax

    t = tuple(target)
    if vol.ndim == 4:
        t = t + (vol.shape[-1],)
    jm = {"linear": "linear", "nearest": "nearest", "cubic": "cubic"}[method]
    out = jax.image.resize(vol.astype(np.float32 if method != "nearest" else vol.dtype), t, method=jm)
    return np.asarray(out)


def crop_or_pad(vol: np.ndarray, target: Sequence[int], pad_value: float = 0.0) -> np.ndarray:
    """Symmetric center crop-or-pad of leading len(target) axes."""
    out = vol
    for ax, t in enumerate(target):
        s = out.shape[ax]
        if s > t:
            start = (s - t) // 2
            sl = [slice(None)] * out.ndim
            sl[ax] = slice(start, start + t)
            out = out[tuple(sl)]
        elif s < t:
            before = (t - s) // 2
            after = t - s - before
            pad = [(0, 0)] * out.ndim
            pad[ax] = (before, after)
            out = np.pad(out, pad, constant_values=pad_value)
    return out


def random_flip(rng: np.random.Generator, *arrays: np.ndarray, axis: int = -1, p: float = 0.5):
    """Jointly flip a set of arrays along `axis` with probability p."""
    if rng.random() < p:
        return tuple(np.flip(a, axis=axis).copy() for a in arrays)
    return arrays


def one_hot_np(labels: np.ndarray, num_classes: int, dtype=np.float32) -> np.ndarray:
    """(…,) int -> (…, C) one-hot, trailing class axis (channels-last)."""
    return np.eye(num_classes, dtype=dtype)[np.clip(labels, 0, num_classes - 1)]
