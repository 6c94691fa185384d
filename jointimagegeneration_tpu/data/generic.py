"""Generic dataset wrappers (equivalents of ccdm/ddpm/dataset_utils.py:26-206
and ldm/data/base.py): H5 volumes, file lists, transformed image+label pairs."""

from __future__ import annotations

import glob as _glob
import os
import threading
from pathlib import Path
from typing import Callable, List, Optional, Sequence

import numpy as np

__all__ = ["H5Dataset", "FileListDataset", "TransformedPairDataset"]


class H5Dataset:
    """Items from an HDF5 file: one group or dataset per case
    (dataset_utils.py H5Dataset).  Keys resolved once at construction."""

    def __init__(self, path: str, keys: Optional[Sequence[str]] = None, transform: Optional[Callable] = None):
        import h5py

        self.path = str(path)
        self._h5: Optional["h5py.File"] = None
        # loader workers are threads sharing this object; HDF5 handles are
        # not thread-safe, so the lazy open and every read serialize here
        self._h5_lock = threading.Lock()
        with h5py.File(self.path, "r") as f:
            self.keys = list(keys or f.keys())
        self.transform = transform

    def _file(self):
        import h5py

        if self._h5 is None:
            self._h5 = h5py.File(self.path, "r")
        return self._h5

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, i: int):
        with self._h5_lock:
            node = self._file()[self.keys[i]]
            if hasattr(node, "keys"):
                item = {k: np.asarray(node[k]) for k in node.keys()}
            else:
                item = {"data": np.asarray(node)}
        item["casename"] = self.keys[i]
        return self.transform(item) if self.transform else item


class FileListDataset:
    """Images (or arrays) enumerated by a list file or glob
    (dataset_utils.py FileListDataset)."""

    def __init__(self, files: Sequence[str] | str, loader: Optional[Callable] = None,
                 transform: Optional[Callable] = None):
        if isinstance(files, str):
            p = Path(files)
            if p.is_file() and p.suffix in (".txt", ".lst"):
                self.files = [l.strip() for l in p.read_text().splitlines() if l.strip()]
            else:
                # glob.glob handles absolute patterns; Path('.').glob raises
                # on them and silently depends on the cwd for relative ones
                self.files = sorted(_glob.glob(files))
        else:
            self.files = list(files)
        self.loader = loader or _default_loader
        self.transform = transform

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i: int):
        item = {"image": self.loader(self.files[i]), "path": self.files[i]}
        return self.transform(item) if self.transform else item


def _default_loader(path: str) -> np.ndarray:
    p = str(path)
    if p.endswith((".nii", ".nii.gz")):
        from .nifti import read_nifti

        return read_nifti(p)[0]
    if p.endswith(".npy"):
        return np.load(p)
    if p.endswith(".npz"):
        with np.load(p) as z:
            return z[list(z.files)[0]]
    from PIL import Image

    return np.asarray(Image.open(p))


class TransformedPairDataset:
    """(image, label) pairs with a joint transform and optional one-hot
    (dataset_utils.py TransformedImgLblDataset)."""

    def __init__(self, base, transform: Optional[Callable] = None,
                 num_classes: Optional[int] = None):
        self.base = base
        self.transform = transform
        self.num_classes = num_classes

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i: int):
        item = dict(self.base[i])
        if self.transform:
            item = self.transform(item)
        if self.num_classes and "label" in item:
            from .transforms import one_hot_np

            item["mask"] = one_hot_np(np.asarray(item.pop("label")), self.num_classes)
        return item


from .datasets import EpochSeededRNG


class ImageFolderDataset(EpochSeededRNG):
    """Images under a directory tree (LSUN/ImageNet-style stock datasets,
    ldm/data/lsun.py, imagenet.py), returned as [0,1] float channels-last,
    optionally center-cropped/resized and SR-degraded."""

    def __init__(self, root: str, size: Optional[int] = None, sr_factor: Optional[int] = None,
                 exts=(".png", ".jpg", ".jpeg", ".bmp"), seed: int = 0):
        root_p = Path(root)
        self.files = sorted(str(p) for p in root_p.rglob("*") if p.suffix.lower() in exts)
        self.size = size
        self.sr_factor = sr_factor
        self._rng_seed = seed

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i: int) -> dict:
        from PIL import Image

        img = np.asarray(Image.open(self.files[i]).convert("RGB"), np.float32) / 255.0
        if self.size:
            h, w = img.shape[:2]
            s = min(h, w)
            img = img[(h - s) // 2 : (h + s) // 2, (w - s) // 2 : (w + s) // 2]
            import jax

            img = np.asarray(jax.image.resize(img, (self.size, self.size, 3), "linear"))
        item = {"image": img, "path": self.files[i]}
        if self.sr_factor:
            from .degradation import degradation_pipeline

            lr, hr = degradation_pipeline(img, self._item_rng(i), sf=self.sr_factor)
            item["lr"] = lr
        return item
