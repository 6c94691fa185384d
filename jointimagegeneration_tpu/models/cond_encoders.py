"""Condition-encoder registry.

Equivalent of ccdm's `_build_feature_cond_encoder`
(ccdm/ddpm/models/condition_encoder.py:22-109): builds the feature/text
condition encoder by type —
  'none'     -> None
  'selfattn' -> TextFeatureRefiner over precomputed BERT features
  'dino'     -> ViTExtractor dense features (for UNet feature concat)
plus the choice of the cond-vis function.  No DDP wrapping: trainable
encoders are plain flax modules whose params join the train state."""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..nn.text import TextFeatureRefiner
from ..nn.vit import ViTExtractor

__all__ = ["build_feature_cond_encoder", "inject_site_downsample", "make_dense_feature_fn"]


def inject_site_downsample(channel_mult, num_res_blocks: int, idx: int) -> int:
    """Spatial downsample factor of the UNet encoder at injection site
    `idx`, mirroring the input_blocks enumeration the reference indexes
    its feature-concat sites with (unet_openai/unet.py:485-507, 785-803;
    nn/unet.py block_idx): idx 0 = stem, each ResBlock advances by one,
    each down-transition advances by one and doubles ds."""
    block_idx, ds = 1, 1
    if idx == 0:
        return 1
    for level in range(len(channel_mult)):
        for _ in range(num_res_blocks):
            if block_idx == idx:
                return ds
            block_idx += 1
        if level != len(channel_mult) - 1:
            if block_idx == idx:
                return ds  # injected before the downsample conv, still at ds
            block_idx += 1
            ds *= 2
    raise ValueError(f"inject_idx {idx} beyond the encoder ({block_idx - 1} sites)")


def make_dense_feature_fn(extractor, params, spatial, layer: int = 11, facet: str = "key"):
    """Jittable (B, H, W, C) images -> (B, th, tw, D) dense feature map,
    resized to the injection-site grid `spatial` — the per-step feature
    computation of the reference train loop (ccdm/ddpm/trainer.py:287 via
    condition_encoder.py:22-109), folded into the jitted step here."""
    th, tw = spatial

    def fn(images: jnp.ndarray) -> jnp.ndarray:
        if images.shape[-1] == 3:
            rgb = images
        else:
            # any non-RGB channel count (1, 2, ...) reduces to a mean channel
            # then tiles to exactly 3 — naive tiling of C≠1 would hand the
            # ViT patch-embed 3·C channels and fail (reference feeds RGB-
            # rendered inputs, dino.py preprocess)
            rgb = jnp.tile(images.mean(-1, keepdims=True), (1,) * (images.ndim - 1) + (3,))
        f = extractor.vit.apply(params, rgb, harvest_layers=(layer,), facet=facet)[0]
        return jax.image.resize(f, (images.shape[0], th, tw, f.shape[-1]), "bilinear")

    return fn


def build_feature_cond_encoder(cfg: dict, key: Optional[jax.Array] = None):
    """Returns (encoder, init_params, trainable: bool).

    encoder is None for 'none'; for 'selfattn' a TextFeatureRefiner module
    (apply with params + (B, T, D) features); for 'dino' a ViTExtractor
    (frozen; extract() yields dense maps)."""
    kind = (cfg or {}).get("type", "none")
    if kind in (None, "none"):
        return None, None, False
    if kind == "selfattn":
        enc = TextFeatureRefiner(
            embed_dim=cfg.get("embed_dim", 768),
            n_heads=cfg.get("n_heads", 8),
            depth=cfg.get("model_depth", 4),
            d_head=cfg.get("d_head", 64),
            dropout=cfg.get("dropout", 0.2),
        )
        params = None
        if key is not None:
            params = enc.init(key, jnp.zeros((1, 4, cfg.get("embed_dim", 768))))
        return enc, params, bool(cfg.get("train", True))
    if kind == "dino":
        ext = ViTExtractor(
            model_type=cfg.get("model_type", "vits8"),
            stride=cfg.get("output_stride", 8),
            weights_path=cfg.get("weights_path"),
        )
        if key is not None:
            ext.init(key)
        return ext, ext.params, False  # frozen (condition_encoder.py: dino not trained)
    raise ValueError(f"unknown feature_cond_encoder type {kind!r}")
