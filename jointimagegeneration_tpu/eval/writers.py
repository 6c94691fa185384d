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

__all__ = ["save_label_volume", "save_image_volume", "save_grid_png", "labels_to_grid",
           "overlay_mask_on_image", "overlay_volume_to_grid"]


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


def overlay_mask_on_image(image: np.ndarray, labels: np.ndarray,
                          overlay_coef: float = 0.2,
                          boundaries: bool = True) -> np.ndarray:
    """Class-colored organ mask alpha-blended over the CT image — the
    capability of the reference ImageLogger's `combine_mask_and_im`
    (latentdiffusion/main.py:28-67), its main qualitative eval artifact.

    Semantics kept: background (class 0) shows the raw image; labeled
    voxels blend `color*coef + image*(1-coef)`; class boundaries (sobel
    magnitude per class, lowest class id wins where boundaries touch) are
    painted in the SOLID class color.

    image: (H, W) or (D, H, W) float in [0, 1]
    labels: same shape, integer class ids in [0, NUM_CLASSES)
    returns uint8 RGB of shape image.shape + (3,)
    """
    from ..data.classes import NUM_CLASSES, class_color_map

    image = np.clip(np.asarray(image, np.float32), 0.0, 1.0)
    labels = np.clip(np.asarray(labels).astype(np.int64), 0, NUM_CLASSES - 1)
    if image.shape != labels.shape:
        raise ValueError(f"image {image.shape} vs labels {labels.shape}")
    colors = class_color_map().astype(np.float32)  # (C, 3)
    im = np.repeat((image * 255.0)[..., None], 3, axis=-1)
    labeled = labels > 0
    colored = np.where(labeled[..., None], colors[labels], im)
    out = colored * overlay_coef + im * (1.0 - overlay_coef)
    # where unlabeled, colored == im so the blend leaves the CT untouched
    if boundaries:
        from scipy.ndimage import sobel

        axes = list(range(labels.ndim))
        bmap = np.zeros(labels.shape, np.int64)
        for i in range(1, NUM_CLASSES):
            m = (labels == i).astype(np.float32)
            if not m.any():
                continue
            mag = np.zeros_like(m)
            for ax in axes:
                mag += np.abs(sobel(m, axis=ax, mode="constant"))
            # first (lowest) class id claims contested boundary voxels
            # (reference: new values only where boundaries == 0)
            bmap = np.where((mag > 0) & (bmap == 0), i, bmap)
        out = np.where((bmap > 0)[..., None], colors[bmap], out)
    return np.clip(out, 0, 255).astype(np.uint8)


def overlay_volume_to_grid(image: np.ndarray, labels: np.ndarray,
                           every: int = 4, overlay_coef: float = 0.2) -> np.ndarray:
    """(D, H, W) CT + labels -> grid of every-nth overlaid axial slice;
    2D inputs render as one panel.  Boundary pass runs on the full volume
    first so slice panels show true 3D organ borders.  NB: the leading
    axis must be a REAL z axis, not a batch of independent images — the
    3D sobel would bleed boundaries across neighbors (render batches one
    overlay_mask_on_image panel at a time instead).  An organ touching
    z=0 / z=D-1 paints its edge-slice cross-section solid (the z sobel
    sees the constant pad) — reference 5D behavior kept
    (find_mask_boundaries_nd, main.py:31-41, mode='constant')."""
    image = np.asarray(image)
    labels = np.asarray(labels)
    if image.ndim == 2:
        image, labels = image[None], labels[None]
    rgb = overlay_mask_on_image(image, labels, overlay_coef=overlay_coef)
    return make_grid([rgb[z] for z in range(0, rgb.shape[0], every)])


def annotate_grid(grid: np.ndarray, text: str, color=(255, 255, 0)) -> np.ndarray:
    """Burn a text label into a grid image (the reference's text/number
    burn-in renderer for qualitative panels, ccdm/ddpm/utils.py:101-145)."""
    from PIL import Image, ImageDraw

    im = Image.fromarray(np.asarray(grid))
    ImageDraw.Draw(im).text((2, 2), text, fill=tuple(color))
    return np.asarray(im)
