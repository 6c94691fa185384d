"""Stock dataset classes: LSUN txt-filelist datasets and local-ImageNet
(+SR) datasets.

Capability parity with ldm/data/lsun.py:1-92 and ldm/data/imagenet.py
(ImageNetBase/_load, ImageNetSR), re-designed for this framework:

  * no torch Dataset base — plain indexable datasets with the same dict
    item contract ("image" in [-1, 1] channels-last, "relative_file_path_",
    "file_path_", class/synset/human labels for ImageNet);
  * no network: the reference downloads synset tables and (for the full
    ImageNet) the tarballs at heibox URLs (imagenet.py:66-90) — this box
    is zero-egress, so the ImageNet variant consumes a LOCAL directory
    tree laid out as <synset>/<file>.JPEG with optional filelist/
    synset_human.txt sidecars;
  * deterministic per-item randomness via EpochSeededRNG (crop/flip draws
    reproduce per (epoch, index), replacing torch's global RNG);
  * SR degradation through data/degradation.py (bsrgan_light parity zoo)
    instead of the vendored 2.3k-LoC cv2 module.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, Optional, Sequence

import numpy as np

from .datasets import EpochSeededRNG

__all__ = ["LSUNBase", "lsun_dataset", "ImageNetLocal", "SRDataset", "SRToLDMAdapter"]

_PIL_INTERP = {"linear": "bilinear", "bilinear": "bilinear", "bicubic": "bicubic",
               "lanczos": "lanczos", "nearest": "nearest"}


def _load_rgb(path: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img, np.uint8)


def _center_square(img: np.ndarray) -> np.ndarray:
    h, w = img.shape[:2]
    crop = min(h, w)
    return img[(h - crop) // 2 : (h + crop) // 2, (w - crop) // 2 : (w + crop) // 2]


def _pil_resize(img: np.ndarray, size: int, interpolation: str) -> np.ndarray:
    from PIL import Image

    name = _PIL_INTERP.get(interpolation, "bicubic").upper()
    resample = getattr(Image, name, Image.BICUBIC)
    return np.asarray(Image.fromarray(img).resize((size, size), resample=resample), np.uint8)


class LSUNBase(EpochSeededRNG):
    """txt filelist + data_root -> {"image": (size, size, 3) float32 in
    [-1, 1], "relative_file_path_", "file_path_"} with center-square crop,
    resize, and p=flip_p horizontal flip (lsun.py:9-59 semantics)."""

    def __init__(self, txt_file: str, data_root: str, size: Optional[int] = None,
                 interpolation: str = "bicubic", flip_p: float = 0.5, seed: int = 0):
        self.image_paths = [l for l in Path(txt_file).read_text().splitlines() if l]
        self.data_root = str(data_root)
        self.size = size
        self.interpolation = interpolation
        self.flip_p = float(flip_p)
        self._rng_seed = seed

    def __len__(self):
        return len(self.image_paths)

    def __getitem__(self, i: int) -> dict:
        rel = self.image_paths[i]
        path = os.path.join(self.data_root, rel)
        img = _center_square(_load_rgb(path))
        if self.size is not None:
            img = _pil_resize(img, self.size, self.interpolation)
        if self.flip_p > 0 and self._item_rng(i).random() < self.flip_p:
            img = img[:, ::-1]
        return {
            "relative_file_path_": rel,
            "file_path_": path,
            "image": (img.astype(np.float32) / 127.5 - 1.0),
        }


_LSUN_SPLITS = {
    # (txt_file, data_root) defaults per reference subclass (lsun.py:62-92)
    ("churches", "train"): ("data/lsun/church_outdoor_train.txt", "data/lsun/churches"),
    ("churches", "val"): ("data/lsun/church_outdoor_val.txt", "data/lsun/churches"),
    ("bedrooms", "train"): ("data/lsun/bedrooms_train.txt", "data/lsun/bedrooms"),
    ("bedrooms", "val"): ("data/lsun/bedrooms_val.txt", "data/lsun/bedrooms"),
    ("cats", "train"): ("data/lsun/cat_train.txt", "data/lsun/cats"),
    ("cats", "val"): ("data/lsun/cat_val.txt", "data/lsun/cats"),
}


def lsun_dataset(category: str, split: str = "train", **kw) -> LSUNBase:
    """LSUNChurchesTrain/-Validation etc. as a factory; validation splits
    default to flip_p=0 like the reference subclasses."""
    try:
        txt, root = _LSUN_SPLITS[(category, split)]
    except KeyError:
        raise ValueError(f"unknown LSUN split {(category, split)!r}") from None
    kw.setdefault("txt_file", txt)
    kw.setdefault("data_root", root)
    if split == "val":
        kw.setdefault("flip_p", 0.0)
    return LSUNBase(**kw)


class ImageNetLocal(EpochSeededRNG):
    """ImageNet-style dataset over a LOCAL synset-per-directory tree.

    Mirrors ImageNetBase._load (imagenet.py:93-133): relpaths from a
    filelist (or directory scan), the one corrupt-file ignore entry,
    optional synset filtering, class ids from sorted unique synsets,
    human labels from a synset_human.txt sidecar when present.  Items are
    {"image" in [-1,1] (center-crop+resize), "relpath", "synset",
    "class_label", "human_label"}; `process_images=False` returns the
    label dict with "abspath" only (the SR wrapper consumes that)."""

    IGNORE = {"n06596364_9591.JPEG"}

    def __init__(self, data_root: str, filelist: Optional[str] = None,
                 size: int = 256, synsets: Optional[Sequence[str]] = None,
                 process_images: bool = True, random_crop: bool = False,
                 flip_p: float = 0.0, seed: int = 0):
        root = Path(data_root)
        if filelist:
            relpaths = [l for l in Path(filelist).read_text().splitlines() if l]
        else:
            relpaths = sorted(
                str(p.relative_to(root)) for p in root.rglob("*")
                if p.suffix.lower() in (".jpeg", ".jpg", ".png") and p.parent != root)
        relpaths = [r for r in relpaths if r.split("/")[-1] not in self.IGNORE]
        if synsets is not None:
            keep = set(synsets)
            relpaths = [r for r in relpaths if r.split("/")[0] in keep]
        self.data_root = str(root)
        self.relpaths = relpaths
        self.synsets = [r.split("/")[0] for r in relpaths]
        uniq = sorted(set(self.synsets))
        class_dict = {s: i for i, s in enumerate(uniq)}
        self.class_labels = [class_dict[s] for s in self.synsets]
        human_path = root / "synset_human.txt"
        human = {}
        if human_path.exists():
            for line in human_path.read_text().splitlines():
                parts = line.split(maxsplit=1)
                if len(parts) == 2:
                    human[parts[0]] = parts[1]
        self.human_labels = [human.get(s, s) for s in self.synsets]
        self.size = size
        self.process_images = process_images
        self.random_crop = random_crop
        self.flip_p = float(flip_p)
        self._rng_seed = seed

    def __len__(self):
        return len(self.relpaths)

    def __getitem__(self, i: int) -> dict:
        rel = self.relpaths[i]
        path = os.path.join(self.data_root, rel)
        item = {
            "relpath": rel,
            "file_path_": path,
            "synset": self.synsets[i],
            "class_label": self.class_labels[i],
            "human_label": self.human_labels[i],
        }
        if not self.process_images:
            return item
        img = _load_rgb(path)
        rng = self._item_rng(i)
        if self.random_crop:
            crop = min(img.shape[:2])
            y = int(rng.integers(0, img.shape[0] - crop + 1))
            x = int(rng.integers(0, img.shape[1] - crop + 1))
            img = img[y : y + crop, x : x + crop]
        else:
            img = _center_square(img)
        img = _pil_resize(img, self.size, "bicubic")
        if self.flip_p > 0 and rng.random() < self.flip_p:
            img = img[:, ::-1]
        item["image"] = img.astype(np.float32) / 127.5 - 1.0
        return item


def _smallest_max_size(img: np.ndarray, size: int, interp: int) -> np.ndarray:
    """albumentations.SmallestMaxSize semantics: scale so the SMALLEST
    side equals `size` (aspect preserved)."""
    import cv2

    h, w = img.shape[:2]
    scale = size / min(h, w)
    return cv2.resize(img, (max(size, int(round(w * scale))), max(size, int(round(h * scale)))),
                      interpolation=interp)


class SRDataset(EpochSeededRNG):
    """Super-resolution pairs over any base dataset yielding "file_path_"
    items (ImageNetSR semantics, imagenet.py:272-374): random/center crop
    of side c·min_side with c ~ U(min_crop_f, max_crop_f), smallest-side
    rescale to `size` (cv2 INTER_AREA), then the configured degradation:
    "bsrgan"/"bsrgan_light" (kernel-zoo pipeline) or a cv_*/pil_*
    interpolation downsample.  Items: {"image", "LR_image"} in [-1, 1]."""

    _CV_INTERP = {"cv_nearest": 0, "cv_bilinear": 1, "cv_bicubic": 2,
                  "cv_area": 3, "cv_lanczos": 4}

    def __init__(self, base, size: int, degradation: str = "bsrgan_light",
                 downscale_f: int = 4, min_crop_f: float = 0.5, max_crop_f: float = 1.0,
                 random_crop: bool = True, seed: int = 0):
        assert size % downscale_f == 0, "size must divide by downscale_f"
        assert max_crop_f <= 1.0
        self.base = base
        self.size = size
        self.lr_size = size // downscale_f
        self.downscale_f = downscale_f
        self.min_crop_f, self.max_crop_f = float(min_crop_f), float(max_crop_f)
        self.center_crop = not random_crop
        self.degradation = degradation
        self._rng_seed = seed

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i: int) -> dict:
        example = dict(self.base[i])
        img = _load_rgb(example["file_path_"])
        rng = self._item_rng(i)
        min_side = min(img.shape[:2])
        crop = int(min_side * rng.uniform(self.min_crop_f, self.max_crop_f))
        crop = max(crop, 1)
        if self.center_crop:
            y = (img.shape[0] - crop) // 2
            x = (img.shape[1] - crop) // 2
        else:
            y = int(rng.integers(0, img.shape[0] - crop + 1))
            x = int(rng.integers(0, img.shape[1] - crop + 1))
        img = img[y : y + crop, x : x + crop]
        import cv2

        img = _smallest_max_size(img, self.size, cv2.INTER_AREA)
        if self.degradation.startswith("cv_"):
            lr_u8 = _smallest_max_size(img, self.lr_size, self._CV_INTERP[self.degradation])
        elif self.degradation.startswith("pil_"):
            lr_u8 = _pil_resize(img, self.lr_size, self.degradation[4:])
        else:
            # everything else routes through the ONE degradation selector
            # (bsrgan_light zoo or the light composable pipeline — both
            # share the (img01, rng, sf) -> (lr, hr) signature)
            from .degradation import get_degradation

            lr, _hq = get_degradation(self.degradation)(
                img.astype(np.float32) / 255.0, rng, sf=self.downscale_f)
            lr_u8 = (np.clip(lr, 0, 1) * 255.0).round().astype(np.uint8)
        example["image"] = img.astype(np.float32) / 127.5 - 1.0
        example["LR_image"] = lr_u8.astype(np.float32) / 127.5 - 1.0
        return example


class SRToLDMAdapter:
    """Adapt SRDataset items to the LDM train contract: cond = the LR
    image upsampled (bicubic) to HR size — the concat conditioning the
    reference's SR configs feed the UNet."""

    def __init__(self, sr: SRDataset):
        self.sr = sr

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.sr, "set_epoch"):
            self.sr.set_epoch(epoch)

    def __len__(self):
        return len(self.sr)

    def __getitem__(self, i: int) -> dict:
        import cv2

        it = self.sr[i]
        h, w = it["image"].shape[:2]
        cond = cv2.resize(it["LR_image"], (w, h), interpolation=cv2.INTER_CUBIC)
        return {"image": it["image"], "cond": cond.reshape(it["image"].shape)}
