"""Composable 2D image+label transform pipeline.

Equivalent of ccdm/datasets/pipelines/transforms.py:17-445 (the pipeline
named by `dataset_pipeline_train: ["flip", "resize", "colorjitter",
"torchvision_normalise"]` in params.yml): joint image/label augmentation
as pure numpy callables composed by name.  Labels always use nearest
resampling; photometric ops touch only the image."""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

__all__ = ["build_transforms", "Compose"]


class Compose:
    def __init__(self, fns: Sequence[Callable]):
        self.fns = list(fns)

    def __call__(self, item: dict, rng: np.random.Generator) -> dict:
        for f in self.fns:
            item = f(item, rng)
        return item


def _resize2d(arr: np.ndarray, hw: Tuple[int, int], nearest: bool) -> np.ndarray:
    import jax

    target = (hw[0], hw[1]) + arr.shape[2:]
    method = "nearest" if nearest else "linear"
    return np.asarray(jax.image.resize(arr, target, method))


def flip(item: dict, rng: np.random.Generator, p: float = 0.5) -> dict:
    if rng.random() < p:
        for k in ("image", "label"):
            if k in item:
                item[k] = np.flip(item[k], axis=1).copy()  # horizontal
    return item


def make_resize(target_size: Tuple[int, int]):
    def resize(item: dict, rng) -> dict:
        if "image" in item:
            item["image"] = _resize2d(np.asarray(item["image"], np.float32), target_size, nearest=False)
        if "label" in item:
            item["label"] = _resize2d(item["label"], target_size, nearest=True)
        return item

    return resize


def make_random_scale(scale_range: Tuple[float, float] = (0.75, 1.25)):
    def random_scale(item: dict, rng: np.random.Generator) -> dict:
        s = rng.uniform(*scale_range)
        if "image" in item:
            h, w = item["image"].shape[:2]
            item["image"] = _resize2d(item["image"], (int(h * s), int(w * s)), nearest=False)
        if "label" in item:
            h, w = item["label"].shape[:2]
            item["label"] = _resize2d(item["label"], (int(h * s), int(w * s)), nearest=True)
        return item

    return random_scale


def make_random_crop(crop_hw: Tuple[int, int], cat_max_ratio: float = 0.75, num_attempts: int = 10):
    """Class-ratio-aware random crop (transforms.py RandomCrop): re-draws the
    window while a single class covers more than cat_max_ratio of it."""

    def random_crop(item: dict, rng: np.random.Generator) -> dict:
        img = item.get("image")
        lbl = item.get("label")
        ref = img if img is not None else lbl
        h, w = ref.shape[:2]
        ch, cw = min(crop_hw[0], h), min(crop_hw[1], w)

        def window():
            y = int(rng.integers(0, h - ch + 1))
            x = int(rng.integers(0, w - cw + 1))
            return y, x

        y, x = window()
        if lbl is not None and cat_max_ratio < 1.0:
            for _ in range(num_attempts):
                patch = lbl[y : y + ch, x : x + cw]
                _, counts = np.unique(patch, return_counts=True)
                if counts.size > 1 and counts.max() / counts.sum() <= cat_max_ratio:
                    break
                y, x = window()
        if img is not None:
            item["image"] = img[y : y + ch, x : x + cw]
        if lbl is not None:
            item["label"] = lbl[y : y + ch, x : x + cw]
        return item

    return random_crop


def make_pad(size_hw: Tuple[int, int], pad_value: float = 0.0, label_pad: int = 0):
    def pad(item: dict, rng) -> dict:
        for k, v in (("image", pad_value), ("label", label_pad)):
            if k in item:
                a = item[k]
                ph = max(0, size_hw[0] - a.shape[0])
                pw = max(0, size_hw[1] - a.shape[1])
                if ph or pw:
                    widths = [(0, ph), (0, pw)] + [(0, 0)] * (a.ndim - 2)
                    item[k] = np.pad(a, widths, constant_values=v)
        return item

    return pad


def make_colorjitter(brightness: float = 0.2, contrast: float = 0.2):
    def colorjitter(item: dict, rng: np.random.Generator) -> dict:
        img = item.get("image")
        if img is None:
            return item
        img = np.asarray(img, np.float32)
        img = img * rng.uniform(1 - contrast, 1 + contrast) + rng.uniform(-brightness, brightness)
        item["image"] = np.clip(img, 0.0, 1.0)
        return item

    return colorjitter


def make_normalise(mean: float = 0.5, std: float = 0.5):
    """torchvision_normalise equivalent: [0,1] -> ~[-1,1]."""

    def normalise(item: dict, rng) -> dict:
        if "image" in item:
            item["image"] = (np.asarray(item["image"], np.float32) - mean) / std
        return item

    return normalise


def build_transforms(names: Sequence[str], settings: Optional[dict] = None) -> Compose:
    """Pipeline by names, mirroring params.yml dataset_pipeline_* keys."""
    settings = settings or {}
    target = tuple(settings.get("target_size", (512, 512)))
    table: Dict[str, Callable] = {
        "flip": flip,
        "resize": make_resize(target),
        "randomscale": make_random_scale(tuple(settings.get("scale_range", (0.75, 1.25)))),
        "randomcrop": make_random_crop(target, settings.get("cat_max_ratio", 0.75)),
        "pad": make_pad(target),
        "colorjitter": make_colorjitter(),
        "torchvision_normalise": make_normalise(),
    }
    return Compose([table[n] for n in names])
