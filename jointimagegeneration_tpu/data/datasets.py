"""Datasets for both stages + synthetic fallbacks.

Re-design of the reference's medical data layer (ccdm/datasets/ruijin.py,
ldm/data/ruijin_pimage_and_mask.py / ruijin.py / ruijin_3d.py) on top of
the framework's own NIfTI codec and numpy transforms:

  * `RuijinMaskDataset` — stage 1: JSON index of {totalseg, crcseg, text}
    per case -> 12-class one-hot (D,H,W,C) volume at 64x128x128, zeros
    image placeholder, precomputed BERT feature .npz context
    (ruijin.py:74-189; the reference trains with precomputed text
    features, :108-111);
  * `RuijinSlicePairDataset` — stage 2: h5-cached windowed CT volumes,
    per-item random z slice returning image=current slice,
    cond=[prev slice, mask slice], plus whole volumes for eval
    (ruijin_pimage_and_mask.py:60-174);
  * `SyntheticMaskDataset` / `SyntheticSliceDataset` — structured random
    cases (ellipsoid 'organs') so every pipeline runs without PHI data.

Items are numpy dicts; batching/prefetch is in loader.py.
"""

from __future__ import annotations

import json
import os
import threading
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .classes import NUM_CLASSES, TOTALSEG_DESIGNATED_LABELS, remap_totalseg_labels
from .native import native_available, one_hot_native, read_nifti_native, remap_labels_native, window_norm_native
from .nifti import read_nifti as _read_nifti_py
from .transforms import crop_or_pad, random_flip, resize_volume
from .transforms import one_hot_np as _one_hot_py
from .transforms import window_norm as _window_norm_py


class EpochSeededRNG:
    """Per-item augmentation RNG: every __getitem__ draws from a fresh
    Generator seeded by (seed, epoch, index).  NumPy Generators are not
    thread-safe, and the loader's worker pool (loader.py) runs __getitem__
    concurrently — a shared self.rng would race; per-call seeding is both
    thread-safe and exactly reproducible.  The loader calls set_epoch each
    pass (the DistributedSampler.set_epoch idiom) so draws still vary
    across epochs."""

    _rng_seed: int = 0
    _epoch: int = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def _item_rng(self, index: int) -> np.random.Generator:
        return np.random.default_rng((self._rng_seed, self._epoch, index))


def read_nifti(path):
    """NIfTI read through the C++ fast path when built (native/), else the
    pure-Python codec."""
    if native_available():
        res = read_nifti_native(path)
        if res is not None:
            return res
    return _read_nifti_py(path)


def remap_labels(seg, tumor=None):
    """TotalSegmentator-id -> class-id remap through the C++ fast path when
    built (one pass instead of ~10 full-volume boolean scans), else the
    pure-Python classes.remap_totalseg_labels."""
    if native_available():
        out = remap_labels_native(seg, tumor, TOTALSEG_DESIGNATED_LABELS, NUM_CLASSES - 1)
        if out is not None:
            return out
    return remap_totalseg_labels(np.asarray(seg), tumor)


def window_norm(image, window_pos=60.0, window_width=360.0):
    if native_available() and isinstance(image, np.ndarray):
        out = window_norm_native(np.array(image, np.float32), window_pos, window_width)
        if out is not None:
            return out
    return _window_norm_py(image, window_pos, window_width)


def one_hot_np(labels, num_classes, dtype=np.float32):
    if native_available() and dtype == np.float32:
        out = one_hot_native(labels, num_classes)
        if out is not None:
            return out
    return _one_hot_py(labels, num_classes, dtype)

__all__ = [
    "RuijinMaskDataset",
    "RuijinSlicePairDataset",
    "SyntheticMaskDataset",
    "SyntheticSliceDataset",
    "train_val_split",
]


def train_val_split(keys: Sequence[str], val_fraction: float = 0.05, seed: int = 0):
    """Persistent-style split (reference writes splits.json, ruijin.py:47-56)."""
    keys = sorted(keys)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(keys))
    n_val = max(1, int(len(keys) * val_fraction))
    val = {keys[i] for i in perm[:n_val]}
    return [k for k in keys if k not in val], [k for k in keys if k in val]


class RuijinMaskDataset(EpochSeededRNG):
    """Stage-1 mask volumes from a JSON index.

    Index schema (one entry per case name):
      {"totalseg": path.nii.gz, "crcseg": path.nii.gz, "text": str,
       "text_features": path.npz (optional)}
    """

    def __init__(
        self,
        index_path: str,
        split: str = "train",
        volume_shape: Tuple[int, int, int] = (64, 128, 128),
        num_classes: int = NUM_CLASSES,
        val_fraction: float = 0.05,
        augment: bool = True,
        max_size: Optional[int] = None,
        seed: int = 0,
    ):
        with open(index_path) as f:
            self.index: Dict[str, dict] = json.load(f)
        train_keys, val_keys = train_val_split(list(self.index), val_fraction, seed)
        self.keys = train_keys if split == "train" else val_keys
        if max_size:
            self.keys = self.keys[:max_size]
        self.base = Path(index_path).parent
        self.volume_shape = volume_shape
        self.num_classes = num_classes
        self.augment = augment and split == "train"
        self._rng_seed = seed + (0 if split == "train" else 1)

    def __len__(self):
        return len(self.keys)

    def _resolve(self, p: str) -> str:
        return p if os.path.isabs(p) else str(self.base / p)

    def __getitem__(self, i: int) -> dict:
        case = self.index[self.keys[i]]
        seg, _ = read_nifti(self._resolve(case["totalseg"]))
        tumor = None
        if case.get("crcseg"):
            tumor, _ = read_nifti(self._resolve(case["crcseg"]))
        labels = remap_labels(seg, tumor)
        # reference: tio.Resize to (128,128,64) in (h,w,z); ours is (D,H,W)
        labels = resize_volume(labels, self.volume_shape, method="nearest").astype(np.int32)
        if self.augment:
            (labels,) = random_flip(self._item_rng(i), labels, axis=-1)
        mask = one_hot_np(labels, self.num_classes)
        context = None
        if case.get("text_features"):
            with np.load(self._resolve(case["text_features"])) as z:
                context = z[list(z.files)[0]].astype(np.float32)
        item = {
            "mask": mask,
            # zeros image placeholder — the checked-in config conditions on a
            # zero image channel (ruijin.py:181-182)
            "image": np.zeros(self.volume_shape + (1,), np.float32),
            "casename": self.keys[i],
        }
        if context is not None:
            item["context"] = context
        if case.get("text"):
            item["text"] = case["text"]
        return item


class RuijinSlicePairDataset(EpochSeededRNG):
    """Stage-2 (image, [prev, mask]) slice pairs from CT+seg volumes.

    Mirrors ruijin_pimage_and_mask.PretrainDataset:141-159: window-normed
    CT, per-item random z, cond channel 0 = previous slice (zeros at z=0),
    cond channel 1 = seg slice scaled into [0,1]."""

    def __init__(
        self,
        index_path: str,
        split: str = "train",
        slice_shape: Tuple[int, int] = (512, 512),
        num_classes: int = NUM_CLASSES,
        val_fraction: float = 0.05,
        include_volumes: bool = False,
        cache_h5: Optional[str] = None,
        seed: int = 0,
    ):
        with open(index_path) as f:
            self.index = json.load(f)
        train_keys, val_keys = train_val_split(list(self.index), val_fraction, seed)
        self.keys = train_keys if split == "train" else val_keys
        self.base = Path(index_path).parent
        self.slice_shape = slice_shape
        self.num_classes = num_classes
        self.include_volumes = include_volumes or split != "train"
        self._rng_seed = seed + 17
        # preprocessed-volume h5 cache (the reference caches aggressively,
        # ruijin_pimage_and_mask.py:161-174); built lazily, guarded by a
        # lock — loader workers are THREADS sharing this object, and HDF5
        # handles are not thread-safe (double-open also trips file locking)
        self.cache_h5 = cache_h5
        self._h5 = None
        self._h5_lock = threading.Lock()

    def __len__(self):
        return len(self.keys)

    def _resolve(self, p):
        return p if os.path.isabs(p) else str(self.base / p)

    def _load_case_uncached(self, case: dict):
        img, _ = read_nifti(self._resolve(case["image"]))
        seg, _ = read_nifti(self._resolve(case["totalseg"]))
        tumor = None
        if case.get("crcseg"):
            tumor, _ = read_nifti(self._resolve(case["crcseg"]))
        labels = remap_labels(seg, tumor)
        img = window_norm(np.asarray(img))
        # (D, H, W) with H,W = slice_shape
        img = crop_or_pad(img, (img.shape[0],) + self.slice_shape)
        labels = crop_or_pad(labels, (labels.shape[0],) + self.slice_shape)
        return img, labels

    def _load_case(self, case: dict, key: Optional[str] = None):
        if not self.cache_h5 or key is None:
            return self._load_case_uncached(case)
        import h5py

        with self._h5_lock:
            if self._h5 is None:
                self._h5 = h5py.File(self.cache_h5, "a")
            if key in self._h5:
                g = self._h5[key]
                return np.asarray(g["image"]), np.asarray(g["labels"])
        # decode outside the lock so cache misses still load in parallel
        img, labels = self._load_case_uncached(case)
        with self._h5_lock:
            if key not in self._h5:  # another worker may have raced the miss
                g = self._h5.create_group(key)
                g.create_dataset("image", data=img, compression="lzf")
                g.create_dataset("labels", data=labels.astype(np.int16), compression="lzf")
                self._h5.flush()
        return img, labels

    def __getitem__(self, i: int) -> dict:
        case = self.index[self.keys[i]]
        img, labels = self._load_case(case, self.keys[i])
        d = img.shape[0]
        z = int(self._item_rng(i).integers(0, d))
        prev = img[z - 1] if z > 0 else np.zeros_like(img[0])
        mask_slice = labels[z].astype(np.float32) / max(self.num_classes - 1, 1)
        item = {
            "image": img[z][..., None].astype(np.float32),
            "cond": np.stack([prev, mask_slice], axis=-1).astype(np.float32),
            "casename": self.keys[i],
        }
        if self.include_volumes:
            item["wholeimage"] = img[..., None].astype(np.float32)
            item["wholemask"] = (labels.astype(np.float32) / max(self.num_classes - 1, 1))[..., None]
        return item


# ---------------------------------------------------------------------------
# synthetic data (tests, benchmarks, demos)
# ---------------------------------------------------------------------------


def _ellipsoid(shape, center, radii):
    grids = np.ogrid[tuple(slice(0, s) for s in shape)]
    acc = np.zeros(shape, np.float32)
    for g, c, r in zip(grids, center, radii):
        acc = acc + ((g - c) / max(r, 1e-3)) ** 2
    return acc <= 1.0


def synthesize_case(rng: np.random.Generator, shape: Tuple[int, int, int], num_classes: int):
    """Random 'abdomen': background 0, several ellipsoid organs, one tumor."""
    labels = np.zeros(shape, np.int32)
    for cls in range(1, num_classes):
        center = [rng.uniform(0.2, 0.8) * s for s in shape]
        radii = [rng.uniform(0.05, 0.22) * s for s in shape]
        labels[_ellipsoid(shape, center, radii)] = cls
    return labels


class SyntheticMaskDataset:
    def __init__(self, num_cases: int = 16, volume_shape=(64, 128, 128), num_classes: int = NUM_CLASSES,
                 context_shape: Optional[Tuple[int, int]] = None, seed: int = 0):
        self.num_cases = num_cases
        self.volume_shape = volume_shape
        self.num_classes = num_classes
        self.context_shape = context_shape
        self.seed = seed

    def __len__(self):
        return self.num_cases

    def __getitem__(self, i: int) -> dict:
        rng = np.random.default_rng(self.seed * 100003 + i)
        labels = synthesize_case(rng, self.volume_shape, self.num_classes)
        item = {
            "mask": one_hot_np(labels, self.num_classes),
            "image": np.zeros(self.volume_shape + (1,), np.float32),
            "casename": f"synth_{i:04d}",
        }
        if self.context_shape is not None:
            item["context"] = rng.standard_normal(self.context_shape).astype(np.float32)
        return item


class SyntheticSliceDataset:
    def __init__(self, num_cases: int = 16, slice_shape=(512, 512), depth: int = 8,
                 num_classes: int = NUM_CLASSES, include_volumes: bool = False, seed: int = 0):
        self.num_cases = num_cases
        self.slice_shape = slice_shape
        self.depth = depth
        self.num_classes = num_classes
        self.include_volumes = include_volumes
        self.seed = seed

    def __len__(self):
        return self.num_cases

    def __getitem__(self, i: int) -> dict:
        rng = np.random.default_rng(self.seed * 65537 + i)
        shape = (self.depth,) + self.slice_shape
        labels = synthesize_case(rng, shape, self.num_classes)
        img = window_norm(labels * 30.0 + rng.standard_normal(shape) * 20.0, 60, 360)
        z = int(rng.integers(0, self.depth))
        prev = img[z - 1] if z > 0 else np.zeros_like(img[0])
        mask_slice = labels[z].astype(np.float32) / max(self.num_classes - 1, 1)
        item = {
            "image": img[z][..., None].astype(np.float32),
            "cond": np.stack([prev, mask_slice], axis=-1).astype(np.float32),
            "casename": f"synth_{i:04d}",
        }
        if self.include_volumes:
            item["wholeimage"] = img[..., None].astype(np.float32)
            item["wholemask"] = (labels.astype(np.float32) / max(self.num_classes - 1, 1))[..., None]
        return item


class RuijinVolumeDataset:
    """3D AE / volume dataset: windowed CT volume + one-hot mask volume +
    text, at (64, 128, 128) (equivalent of ldm/data/ruijin_3d.py
    AutoencoderDataset:129-186)."""

    def __init__(self, index_path: str, split: str = "train",
                 volume_shape: Tuple[int, int, int] = (64, 128, 128),
                 num_classes: int = NUM_CLASSES, val_fraction: float = 0.05, seed: int = 0):
        with open(index_path) as f:
            self.index = json.load(f)
        train_keys, val_keys = train_val_split(list(self.index), val_fraction, seed)
        self.keys = train_keys if split == "train" else val_keys
        self.base = Path(index_path).parent
        self.volume_shape = volume_shape
        self.num_classes = num_classes

    def __len__(self):
        return len(self.keys)

    def _resolve(self, p):
        return p if os.path.isabs(p) else str(self.base / p)

    def __getitem__(self, i: int) -> dict:
        case = self.index[self.keys[i]]
        img, _ = read_nifti(self._resolve(case["image"]))
        seg, _ = read_nifti(self._resolve(case["totalseg"]))
        tumor = None
        if case.get("crcseg"):
            tumor, _ = read_nifti(self._resolve(case["crcseg"]))
        labels = remap_labels(seg, tumor)
        img = window_norm(np.asarray(img))
        img = resize_volume(img, self.volume_shape, "linear")
        labels = resize_volume(labels, self.volume_shape, "nearest").astype(np.int32)
        item = {
            "image": img[..., None].astype(np.float32),
            "mask": one_hot_np(labels, self.num_classes),
            "casename": self.keys[i],
        }
        if case.get("text"):
            item["text"] = case["text"]
        return item


class NNUNetLayoutDataset(EpochSeededRNG):
    """nnUNet-style folder layout: imagesTr/<case>_0000.nii.gz +
    labelsTr/<case>.nii.gz (equivalent of ldm/data/cmu.py:40-108)."""

    def __init__(self, root: str, split: str = "train",
                 slice_shape: Tuple[int, int] = (512, 512),
                 num_classes: int = NUM_CLASSES, val_fraction: float = 0.05,
                 include_volumes: bool = False, seed: int = 0):
        root_p = Path(root)
        cases = sorted(p.name.replace("_0000.nii.gz", "") for p in (root_p / "imagesTr").glob("*_0000.nii.gz"))
        train_keys, val_keys = train_val_split(cases, val_fraction, seed)
        self.keys = train_keys if split == "train" else val_keys
        self.root = root_p
        self.slice_shape = slice_shape
        self.num_classes = num_classes
        self.include_volumes = include_volumes or split != "train"
        self._rng_seed = seed + 31

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, i: int) -> dict:
        name = self.keys[i]
        img, _ = read_nifti(self.root / "imagesTr" / f"{name}_0000.nii.gz")
        labels, _ = read_nifti(self.root / "labelsTr" / f"{name}.nii.gz")
        img = window_norm(np.asarray(img))
        labels = np.asarray(labels).astype(np.int32)
        img = crop_or_pad(img, (img.shape[0],) + self.slice_shape)
        labels = crop_or_pad(labels, (labels.shape[0],) + self.slice_shape)
        z = int(self._item_rng(i).integers(0, img.shape[0]))
        prev = img[z - 1] if z > 0 else np.zeros_like(img[0])
        mask_slice = labels[z].astype(np.float32) / max(self.num_classes - 1, 1)
        item = {
            "image": img[z][..., None].astype(np.float32),
            "cond": np.stack([prev, mask_slice], axis=-1).astype(np.float32),
            "casename": name,
        }
        if self.include_volumes:
            item["wholeimage"] = img[..., None].astype(np.float32)
            item["wholemask"] = (labels.astype(np.float32) / max(self.num_classes - 1, 1))[..., None]
        return item
