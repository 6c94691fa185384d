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

__all__ = ["build_feature_cond_encoder"]


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
