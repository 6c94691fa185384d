"""FVD (Fréchet Video Distance) over CT volumes.

The reference *calls* FVD but ships no implementation
(latentdiffusion/sample_diffusion.py:477-488 imports the absent
scripts/fvd.py).  This module completes the capability: Fréchet distance
(eval/metrics.py) over per-volume features from a pluggable extractor.

Extractors:
  * `i3d_feature_fn(path)` — loads an I3D/torchscript checkpoint via
    torch if one is available on disk (no network access is assumed);
  * `downsample_feature_fn` — deterministic spatial-pyramid statistics
    (always available): per-scale means/stds over a 3-level pyramid.
    Not calibrated to the published FVD scale, but a valid Fréchet
    metric for regression tracking between runs.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from .metrics import frechet_distance

__all__ = ["fvd", "downsample_feature_fn", "i3d_feature_fn", "i3d_npz_feature_fn"]


def downsample_feature_fn(vol: np.ndarray, levels: int = 3) -> np.ndarray:
    """(D, H, W) -> (F,) pyramid statistics feature vector.

    Fixed length for ANY input size: per-axis profiles are resampled to
    exactly 8 taps, and the pyramid stops halving once a dimension would
    vanish (a depth-3 volume previously produced empty slices -> NaN
    features -> LinAlgError inside the Fréchet distance)."""
    feats = []
    v = np.asarray(vol, np.float32)

    def profile(x: np.ndarray) -> np.ndarray:  # 1-D profile -> 8 taps
        idx = np.linspace(0, len(x) - 1, 8).round().astype(int)
        return x[idx]

    for _ in range(levels):
        feats.extend([v.mean(), v.std()])
        # per-axis profiles (coarse structure)
        feats.extend(profile(v.mean(axis=(1, 2))))
        feats.extend(profile(v.mean(axis=(0, 2))))
        feats.extend(profile(v.mean(axis=(0, 1))))
        if min(v.shape) >= 2:
            v = v[: v.shape[0] // 2 * 2, : v.shape[1] // 2 * 2, : v.shape[2] // 2 * 2]
            v = v.reshape(v.shape[0] // 2, 2, v.shape[1] // 2, 2, v.shape[2] // 2, 2).mean((1, 3, 5))
    return np.asarray(feats, np.float32)


def i3d_feature_fn(checkpoint_path: str) -> Callable[[np.ndarray], np.ndarray]:
    """Returns a (D, H, W) -> (F,) extractor from a torchscript I3D model."""
    import torch

    model = torch.jit.load(checkpoint_path, map_location="cpu").eval()

    def fn(vol: np.ndarray) -> np.ndarray:
        v = torch.from_numpy(np.asarray(vol, np.float32))
        v = v[None, None].repeat(1, 3, 1, 1, 1) * 2 - 1  # (1, 3, D, H, W) in [-1,1]
        with torch.no_grad():
            out = model(v)
        return out.numpy().reshape(-1)

    return fn


def i3d_npz_feature_fn(npz_path: str) -> Callable[[np.ndarray], np.ndarray]:
    """(D, H, W) -> (400,) extractor from the NATIVE JAX I3D (eval/i3d.py)
    with weights converted by scripts/convert_i3d_weights.py — FVD features
    computed on-device (jitted), no torch at eval time."""
    import jax
    import jax.numpy as jnp

    from .i3d import i3d_features, load_i3d_npz

    params = load_i3d_npz(npz_path)
    run = jax.jit(lambda v: i3d_features(params, v))

    def fn(vol: np.ndarray) -> np.ndarray:
        v = jnp.asarray(vol, jnp.float32)[None, ..., None]  # (1, D, H, W, 1)
        v = jnp.tile(v, (1, 1, 1, 1, 3)) * 2.0 - 1.0
        return np.asarray(run(v)).reshape(-1)

    return fn


def fvd(
    real_volumes: Sequence[np.ndarray],
    generated_volumes: Sequence[np.ndarray],
    feature_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
) -> float:
    feature_fn = feature_fn or downsample_feature_fn
    fa = np.stack([feature_fn(v) for v in real_volumes])
    fb = np.stack([feature_fn(v) for v in generated_volumes])
    return frechet_distance(fa, fb)
