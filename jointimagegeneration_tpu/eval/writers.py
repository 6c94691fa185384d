"""Output writers: NIfTI volumes + PNG grids.

Equivalent of the reference's per-case dumps — gt/pred .nii.gz via
SimpleITK (ccdm/ddpm/evaluator.py:141-148) and PNG grids via torchvision
make_grid (trainer.py:599-622, ldm main.py:419-449) — built on the
framework's own NIfTI codec and PIL."""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from ..data.classes import labels_to_colors
from ..data.nifti import write_nifti

__all__ = ["save_label_volume", "save_image_volume", "save_grid_png", "labels_to_grid"]


def save_label_volume(path, labels: np.ndarray, spacing=None) -> None:
    """Integer (D, H, W) label volume -> .nii.gz (pred.nii.gz contract)."""
    write_nifti(path, np.asarray(labels).astype(np.uint8), spacing=spacing)


def save_image_volume(path, image: np.ndarray, spacing=None) -> None:
    write_nifti(path, np.asarray(image).astype(np.float32), spacing=spacing)


def make_grid(images: Sequence[np.ndarray], ncols: int = 8, pad: int = 2) -> np.ndarray:
    """(N, H, W, 3) uint8 -> single grid image."""
    images = [np.asarray(im) for im in images]
    n = len(images)
    h, w = images[0].shape[:2]
    ncols = min(ncols, n)
    nrows = -(-n // ncols)
    grid = np.zeros((nrows * (h + pad) - pad, ncols * (w + pad) - pad, 3), np.uint8)
    for i, im in enumerate(images):
        r, c = divmod(i, ncols)
        grid[r * (h + pad) : r * (h + pad) + h, c * (w + pad) : c * (w + pad) + w] = im
    return grid


def labels_to_grid(labels: np.ndarray, every: int = 4) -> np.ndarray:
    """(D, H, W) label volume -> color grid of every-nth axial slice;
    a 2D (H, W) map (the 2D dataset variants) renders as one panel."""
    labels = np.asarray(labels)
    if labels.ndim == 2:
        labels = labels[None]
    slices = [labels_to_colors(labels[z]) for z in range(0, labels.shape[0], every)]
    return make_grid(slices)


def save_grid_png(path, grid: np.ndarray) -> None:
    from PIL import Image

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(grid).save(str(path))


def image_volume_to_grid(vol: np.ndarray, every: int = 4) -> np.ndarray:
    """(D, H, W) float volume in [0,1] -> grayscale RGB grid; (H, W)
    renders as one panel."""
    vol = np.clip(np.asarray(vol), 0, 1)
    if vol.ndim == 2:
        vol = vol[None]
    slices = [(np.stack([vol[z]] * 3, -1) * 255).astype(np.uint8) for z in range(0, vol.shape[0], every)]
    return make_grid(slices)


def annotate_grid(grid: np.ndarray, text: str, color=(255, 255, 0)) -> np.ndarray:
    """Burn a text label into a grid image (the reference's text/number
    burn-in renderer for qualitative panels, ccdm/ddpm/utils.py:101-145)."""
    from PIL import Image, ImageDraw

    im = Image.fromarray(np.asarray(grid))
    ImageDraw.Draw(im).text((2, 2), text, fill=tuple(color))
    return np.asarray(im)
