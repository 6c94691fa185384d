"""Text conditioning encoders.

  * `TextFeatureRefiner` — trainable self-attention refiner over
    precomputed BERT features, the TPU equivalent of PreloadedBERTEncoder
    (ccdm/ddpm/models/encoder.py:103-123): N BasicTransformerBlocks of
    pure self-attention + residual.  This is the encoder the reference
    actually trains with (precomputed .npz features,
    ccdm/datasets/ruijin.py:108-111).
  * `FrozenBERTEmbedder` — host-side frozen HF BERT for on-the-fly text
    encoding (encoder.py:21-101), gated on `transformers`; includes the
    long-report splitting behaviour (>512 tokens -> chunked encode +
    concat).  Runs in torch on CPU, emits numpy features the JAX models
    consume as `context`.
  * `IdentityEncoder` — passthrough cond encoder
    (ldm/modules/encoders/modules.py:287-289), the stage-2 default.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .transformer import BasicTransformerBlock

__all__ = [
    "TextFeatureRefiner", "FrozenBERTEmbedder", "IdentityEncoder",
    "TransformerTextEncoder", "ClassEmbedder", "HybridConditioner",
    "SpatialRescaler",
]


class TextFeatureRefiner(nn.Module):
    """(B, T, D) precomputed text features -> refined (B, T, D), residual."""

    embed_dim: int = 768
    n_heads: int = 8
    depth: int = 4
    d_head: int = 64
    dropout: float = 0.2

    @nn.compact
    def __call__(self, feats: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        h = feats
        for i in range(self.depth):
            h = BasicTransformerBlock(self.n_heads, self.d_head, self.dropout, name=f"block_{i}")(
                h, None, deterministic=deterministic
            )
        return h + feats


class TransformerTextEncoder(nn.Module):
    """Trainable token-level text encoder: embedding + learned positions +
    N self-attention blocks -> (B, T, D) context.

    Native equivalent of BERTEmbedder + the vendored x_transformer stack
    (ldm/modules/encoders/modules.py TransformerEmbedder/BERTEmbedder,
    ldm/modules/x_transformer.py)."""

    vocab_size: int = 30522
    embed_dim: int = 768
    depth: int = 6
    n_heads: int = 8
    d_head: int = 64
    max_len: int = 512
    dropout: float = 0.0

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        b, t = tokens.shape
        tok = nn.Embed(self.vocab_size, self.embed_dim, name="tok_emb")(tokens)
        pos = self.param("pos_emb", nn.initializers.normal(0.02), (self.max_len, self.embed_dim))
        h = tok + pos[None, :t]
        for i in range(self.depth):
            h = BasicTransformerBlock(self.n_heads, self.d_head, self.dropout, name=f"block_{i}")(
                h, None, deterministic=deterministic
            )
        return nn.LayerNorm(name="norm")(h)


class ClassEmbedder(nn.Module):
    """Class-id -> (B, 1, D) context (modules.py ClassEmbedder:22-35)."""

    n_classes: int
    embed_dim: int = 512

    @nn.compact
    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        return nn.Embed(self.n_classes, self.embed_dim, name="embedding")(y)[:, None, :]


class HybridConditioner(nn.Module):
    """Pairs a concat-conditioner with a crossattn-conditioner for the
    UNet's hybrid mode (diffusionmodules/util.py:251-261): the two raw
    conditions run through their own encoders and come back as the
    {c_concat, c_crossattn} pair DiffusionWrapper-hybrid consumes
    (ddpm.py:1421-1425 — here: SliceLDM.apply_model(cond=…, context=…))."""

    concat_conditioner: nn.Module
    crossattn_conditioner: nn.Module

    def __call__(self, c_concat: jnp.ndarray, c_crossattn: jnp.ndarray) -> dict:
        return {
            "c_concat": self.concat_conditioner(c_concat),
            "c_crossattn": self.crossattn_conditioner(c_crossattn),
        }


class SpatialRescaler(nn.Module):
    """Downscale a spatial condition n_stages times by `multiplier`, with
    an optional 1×1 channel remap (ldm/modules/encoders/modules.py
    SpatialRescaler) — used when a pixel-space condition must match a
    latent-space UNet input grid.  NHWC; `method` is any jax.image mode."""

    n_stages: int = 1
    multiplier: float = 0.5
    method: str = "bilinear"
    out_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        for _ in range(self.n_stages):
            b, h, w, c = x.shape
            x = jax.image.resize(
                x, (b, max(1, int(h * self.multiplier)), max(1, int(w * self.multiplier)), c),
                method=self.method)
        if self.out_channels is not None:
            x = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="channel_mapper")(x)
        return x


class IdentityEncoder:
    """cond passthrough (stage-2 primary config)."""

    def __call__(self, x):
        return x

    def encode(self, x):
        return x


class FrozenBERTEmbedder:
    """Frozen HF BERT feature extractor (host-side, torch CPU).

    Returns last_hidden_state as numpy (B, n_chunks*L, D).  Long texts are
    split into max_length chunks and encoded separately, mirroring the
    reference's huffman-split path for >512-token Chinese reports."""

    def __init__(self, model_name_or_path: str, max_length: int = 512, device: str = "cpu"):
        try:
            import torch
            from transformers import AutoModel, AutoTokenizer
        except ImportError as e:  # pragma: no cover
            raise ImportError("FrozenBERTEmbedder requires `transformers` + `torch`") from e
        self._torch = torch
        self.tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
        self.model = AutoModel.from_pretrained(model_name_or_path).eval().to(device)
        for p in self.model.parameters():
            p.requires_grad = False
        self.max_length = max_length
        self.device = device

    def __call__(self, texts) -> np.ndarray:
        torch = self._torch
        if isinstance(texts, str):
            texts = [texts]
        feats = []
        with torch.no_grad():
            for text in texts:
                ids = self.tokenizer(text, return_tensors="pt", truncation=False)["input_ids"][0]
                chunks = [ids[i : i + self.max_length] for i in range(0, len(ids), self.max_length)] or [ids]
                outs = []
                for ch in chunks:
                    out = self.model(ch[None].to(self.device)).last_hidden_state
                    outs.append(out[0])
                feats.append(torch.cat(outs, dim=0).cpu().numpy())
        maxlen = max(f.shape[0] for f in feats)
        out = np.zeros((len(feats), maxlen, feats[0].shape[-1]), np.float32)
        for i, f in enumerate(feats):
            out[i, : f.shape[0]] = f
        return out
