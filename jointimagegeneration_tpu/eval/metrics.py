"""Evaluation metrics.

Native implementations of everything the reference outsources:
  * Dice via confusion matrix with ignore_index — ignite
    ConfusionMatrix→DiceCoefficient (ccdm/ddpm/trainer.py:488-492,
    evaluator.py:188-190);
  * per-class dice/precision/recall — medpy calls (trainer.py:364-370);
  * GED + Hungarian-matched IoU — LIDC-legacy distribution metrics
    (ccdm/ddpm/utils.py:148-236);
  * Fréchet distance — the core of FVD (scripts/fvd.py is absent from the
    reference; latentdiffusion/sample_diffusion.py:477-488 calls it).

JAX for the heavy voxel reductions (device-side), numpy/scipy for the
small matrix solves.
"""

from __future__ import annotations

from itertools import combinations
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "confusion_matrix",
    "dice_from_confusion",
    "per_class_dice",
    "per_class_precision_recall",
    "iou_distance_matrix",
    "generalized_energy_distance",
    "hungarian_matched_iou",
    "frechet_distance",
]


def confusion_matrix(pred: jnp.ndarray, target: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """(C, C) counts[i, j] = #{target==i & pred==j} over all voxels."""
    idx = target.reshape(-1) * num_classes + pred.reshape(-1)
    counts = jnp.bincount(idx, length=num_classes * num_classes)
    return counts.reshape(num_classes, num_classes)


def dice_from_confusion(cm: jnp.ndarray, ignore_index: Optional[int] = None) -> jnp.ndarray:
    """Per-class dice = 2*tp / (2*tp + fp + fn); ignore_index dropped."""
    tp = jnp.diag(cm)
    fp = cm.sum(0) - tp
    fn = cm.sum(1) - tp
    dice = 2 * tp / jnp.maximum(2 * tp + fp + fn, 1)
    if ignore_index is not None:
        keep = jnp.arange(cm.shape[0]) != ignore_index
        dice = dice[keep]
    return dice


def per_class_dice(pred: jnp.ndarray, target: jnp.ndarray, num_classes: int,
                   ignore_index: Optional[int] = None) -> jnp.ndarray:
    return dice_from_confusion(confusion_matrix(pred, target, num_classes), ignore_index)


def per_class_precision_recall(pred: jnp.ndarray, target: jnp.ndarray, num_classes: int):
    cm = confusion_matrix(pred, target, num_classes)
    tp = jnp.diag(cm)
    precision = tp / jnp.maximum(cm.sum(0), 1)
    recall = tp / jnp.maximum(cm.sum(1), 1)
    return precision, recall


# ---------------------------------------------------------------------------
# distribution metrics over sample sets (GED / HM-IoU)
# ---------------------------------------------------------------------------


def _iou_dist(a: np.ndarray, b: np.ndarray, num_classes: int, ignore: Sequence[int]) -> float:
    """1 - mean IoU over non-ignored classes present in either volume."""
    ious = []
    for c in range(num_classes):
        if c in ignore:
            continue
        pa, pb = a == c, b == c
        union = np.logical_or(pa, pb).sum()
        if union == 0:
            continue
        ious.append(np.logical_and(pa, pb).sum() / union)
    if not ious:
        return 0.0
    return 1.0 - float(np.mean(ious))


def iou_distance_matrix(samples: np.ndarray, references: np.ndarray, num_classes: int,
                        ignore: Sequence[int] = (0,)) -> np.ndarray:
    """(S, R) pairwise 1-IoU distances between label volumes."""
    S, R = len(samples), len(references)
    d = np.zeros((S, R))
    for i in range(S):
        for j in range(R):
            d[i, j] = _iou_dist(samples[i], references[j], num_classes, ignore)
    return d


def generalized_energy_distance(samples: np.ndarray, references: np.ndarray, num_classes: int,
                                ignore: Sequence[int] = (0,)) -> float:
    """GED² = 2·E[d(s,r)] − E[d(s,s')] − E[d(r,r')] with d = 1−IoU
    (ccdm/ddpm/utils.py LIDC metrics)."""
    d_sr = iou_distance_matrix(samples, references, num_classes, ignore).mean()
    d_ss = iou_distance_matrix(samples, samples, num_classes, ignore)
    d_rr = iou_distance_matrix(references, references, num_classes, ignore)
    s = len(samples)
    r = len(references)
    e_ss = d_ss.sum() / (s * s)
    e_rr = d_rr.sum() / (r * r)
    return float(2 * d_sr - e_ss - e_rr)


def hungarian_matched_iou(samples: np.ndarray, references: np.ndarray, num_classes: int,
                          ignore: Sequence[int] = (0,)) -> float:
    """Mean IoU under the optimal sample↔reference assignment."""
    from scipy.optimize import linear_sum_assignment

    d = iou_distance_matrix(samples, references, num_classes, ignore)
    rows, cols = linear_sum_assignment(d)
    return float(1.0 - d[rows, cols].mean())


# ---------------------------------------------------------------------------
# Fréchet distance (FID/FVD core)
# ---------------------------------------------------------------------------


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray, eps: float = 1e-6) -> float:
    """||mu_a - mu_b||² + tr(Sa + Sb - 2(Sa Sb)^{1/2}); (N, D) features."""
    mu_a, mu_b = feats_a.mean(0), feats_b.mean(0)
    sa = np.cov(feats_a, rowvar=False)
    sb = np.cov(feats_b, rowvar=False)
    diff = mu_a - mu_b
    return float(diff @ diff + np.trace(sa) + np.trace(sb)
                 - 2 * _trace_sqrt_product(sa, sb, eps))


def _trace_sqrt_product(sa: np.ndarray, sb: np.ndarray, eps: float) -> float:
    """tr((Sa Sb)^{1/2}), robust to the rank-deficient covariances of small
    sample sets: scipy.sqrtm first; on failure (it RAISES on some singular
    products, e.g. 2-sample covs) the PSD-safe identity
    tr((Sa Sb)^{1/2}) = tr((Sa^{1/2} Sb Sa^{1/2})^{1/2}) via eigh with
    eigenvalues clipped at 0."""
    from scipy import linalg

    try:
        covmean = linalg.sqrtm(sa @ sb)
        if isinstance(covmean, tuple):  # older scipy returned (sqrtm, errest)
            covmean = covmean[0]
        if np.isfinite(covmean).all():
            if np.iscomplexobj(covmean):
                covmean = covmean.real
            return float(np.trace(covmean))
    except Exception:
        pass
    n = sa.shape[0]
    wa, va = np.linalg.eigh((sa + sa.T) / 2 + eps * np.eye(n))
    root_a = (va * np.sqrt(np.clip(wa, 0, None))) @ va.T
    m = root_a @ ((sb + sb.T) / 2 + eps * np.eye(n)) @ root_a
    w = np.linalg.eigvalsh((m + m.T) / 2)
    return float(np.sum(np.sqrt(np.clip(w, 0, None))))
