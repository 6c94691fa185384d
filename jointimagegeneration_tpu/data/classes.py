"""Abdominal organ class table (the re-specified `ruijin_config`).

The reference's `ccdm/datasets/ruijin_config.py` ships only as .pyc; the
class table is recoverable from latentdiffusion/main.py:48-62 and the
label remap from ccdm/datasets/ruijin.py:31-38: TotalSegmentator ids
[1,2,3,5,6,10,55,56,57,104] -> classes 1..10, colorectal tumor -> 11,
background 0.  12 classes total.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import numpy as np

__all__ = [
    "OrganClass",
    "ABD_ORGAN_CLASSES",
    "NUM_CLASSES",
    "TOTALSEG_DESIGNATED_LABELS",
    "remap_totalseg_labels",
    "class_color_map",
    "labels_to_colors",
]


class OrganClass(NamedTuple):
    label_name: str
    totalseg_id: int
    color: Tuple[int, int, int]


ABD_ORGAN_CLASSES: List[OrganClass] = [
    OrganClass("unlabeled", 0, (0, 0, 0)),
    OrganClass("spleen", 1, (0, 80, 100)),
    OrganClass("kidney_left", 2, (119, 11, 32)),
    OrganClass("kidney_right", 3, (119, 11, 32)),
    OrganClass("liver", 5, (250, 170, 30)),
    OrganClass("stomach", 6, (220, 220, 0)),
    OrganClass("pancreas", 10, (107, 142, 35)),
    OrganClass("small_bowel", 55, (255, 0, 0)),
    OrganClass("duodenum", 56, (70, 130, 180)),
    OrganClass("colon", 57, (0, 0, 255)),
    OrganClass("urinary_bladder", 104, (0, 255, 255)),
    OrganClass("colorectal_cancer", 255, (0, 255, 0)),
]

NUM_CLASSES = len(ABD_ORGAN_CLASSES)  # 12

# TotalSegmentator ids remapped to 1..10 (ccdm/datasets/ruijin.py:31-38)
TOTALSEG_DESIGNATED_LABELS = (1, 2, 3, 5, 6, 10, 55, 56, 57, 104)


def remap_totalseg_labels(label: np.ndarray, tumor_mask: np.ndarray | None = None) -> np.ndarray:
    """TotalSegmentator label volume -> contiguous class ids; tumor voxels
    (crcseg) are assigned the last class (ruijin.py:31-38,176)."""
    out = np.zeros_like(label, dtype=np.int32)
    for i, l in enumerate(TOTALSEG_DESIGNATED_LABELS):
        out[label == l] = i + 1
    if tumor_mask is not None:
        out[tumor_mask > 0] = NUM_CLASSES - 1
    return out


def class_color_map() -> np.ndarray:
    """(C, 3) uint8 color table for rendering (the re-specified
    `decode_target_to_crc_color` of ccdm/datasets/cityscapes_config.pyc)."""
    return np.asarray([c.color for c in ABD_ORGAN_CLASSES], dtype=np.uint8)


def labels_to_colors(labels: np.ndarray) -> np.ndarray:
    """Integer label array -> RGB uint8 (…, 3)."""
    return class_color_map()[np.clip(labels, 0, NUM_CLASSES - 1)]
