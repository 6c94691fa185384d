"""Sliding-window tiled apply with border-weighted stitching.

Equivalent of the reference's fold/unfold big-image inference
(ldm/models/diffusion/ddpm.py:573-660, applied at :728-876, 915-997):
an oversized input is processed as overlapping patches, each patch
result weighted by distance-to-border, and the weighted patches folded
back with normalisation.

TPU shape: the patch loop is a `lax.scan` over statically enumerated
window offsets (`lax.dynamic_slice` in, `dynamic_update_slice`
accumulate out), so arbitrary image sizes compile to one program per
(size, patch, stride) triple.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["border_weighting", "tiled_apply"]


def border_weighting(patch_hw: Tuple[int, int], alpha: float = 1e-2) -> jnp.ndarray:
    """(h, w) weights = clipped normalised L1 distance to the nearest border
    (ddpm.py delta_border/get_weighting, :573-608)."""
    h, w = patch_hw
    ys = (np.arange(h) + 0.5) / h
    xs = (np.arange(w) + 0.5) / w
    dy = np.minimum(ys, 1 - ys)
    dx = np.minimum(xs, 1 - xs)
    d = np.minimum(dy[:, None], dx[None, :]) * 2  # in [0, 1]
    return jnp.asarray(np.clip(d, alpha, 1.0), jnp.float32)


def _offsets(size: int, patch: int, stride: int) -> np.ndarray:
    if size <= patch:
        return np.array([0])
    offs = list(range(0, size - patch + 1, stride))
    if offs[-1] != size - patch:
        offs.append(size - patch)
    return np.asarray(offs)


def tiled_apply(
    fn: Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,  # (B, H, W, C)
    patch: Tuple[int, int],
    stride: Tuple[int, int],
    out_channels: int | None = None,
    out_scale: float = 1.0,
) -> jnp.ndarray:
    """Apply `fn` ((B, ph, pw, C) -> (B, ph*s, pw*s, C')) over overlapping
    windows; fold back with border weighting.

    `out_scale` s handles resolution-changing fns — the reference's uf/df
    rescale factors for tiled first-stage encode (s = 1/f) and decode
    (s = f) (ddpm.py:728-876, 915-997).  Patch, stride and image size must
    scale to integers."""
    b, h, w, c = x.shape
    ph, pw = patch
    oy = _offsets(h, ph, stride[0])
    ox = _offsets(w, pw, stride[1])

    def scaled(v: int) -> int:
        sv = v * out_scale
        assert abs(sv - round(sv)) < 1e-9, f"{v} * out_scale={out_scale} is not an integer"
        return int(round(sv))

    pho, pwo = scaled(ph), scaled(pw)
    ho, wo = scaled(h), scaled(w)
    # carry BOTH input- and output-space offsets (all exactly known host-side)
    # — reconstructing one from the other via a float multiply can truncate
    # one pixel low for non-power-of-two scales
    grid = jnp.asarray([(y, xo, scaled(y), scaled(xo)) for y in oy for xo in ox], jnp.int32)
    weight = border_weighting((pho, pwo))[None, :, :, None]
    c_out = out_channels or c

    def body(carry, off):
        acc, norm = carry
        yi, xi, y, xo = off[0], off[1], off[2], off[3]
        tile = jax.lax.dynamic_slice(x, (0, yi, xi, 0), (b, ph, pw, c))
        res = fn(tile).astype(jnp.float32) * weight
        acc = jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (0, y, xo, 0), (b, pho, pwo, c_out)) + res, (0, y, xo, 0)
        )
        norm = jax.lax.dynamic_update_slice(
            norm, jax.lax.dynamic_slice(norm, (0, y, xo, 0), (b, pho, pwo, 1)) + weight, (0, y, xo, 0)
        )
        return (acc, norm), None

    acc0 = jnp.zeros((b, ho, wo, c_out), jnp.float32)
    norm0 = jnp.zeros((b, ho, wo, 1), jnp.float32)
    (acc, norm), _ = jax.lax.scan(body, (acc0, norm0), grid)
    return (acc / jnp.maximum(norm, 1e-8)).astype(x.dtype)
