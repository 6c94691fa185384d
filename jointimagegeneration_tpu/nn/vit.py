"""ViT feature extractor (the 'dino' condition-encoder capability).

Native equivalent of ccdm/ddpm/models/dino.py:15-342 (ViTExtractor):
patch-embed with adjustable stride (the reference's overlapping-patch
trick), positional-embedding re-interpolation for arbitrary input sizes,
and per-layer key/token feature harvesting for dense conditioning.  The
reference pulls pretrained DINO weights from torch.hub; this environment
has no egress, so weights load from a local torch checkpoint when given
(`load_torch_weights`) and otherwise the module runs with its own
initialisation (feature geometry identical, features uncalibrated).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["ViTExtractor"]


class _ViTBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_keys: bool = False, return_attn: bool = False):
        h = nn.LayerNorm(name="norm1")(x)
        b, t, d = h.shape
        qkv = nn.Dense(3 * d, name="qkv")(h).reshape(b, t, 3, self.heads, d // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d // self.heads), axis=-1
        )
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, t, d)
        x = x + nn.Dense(d, name="proj")(o)
        h2 = nn.LayerNorm(name="norm2")(x)
        x = x + nn.Dense(d, name="fc2")(nn.gelu(nn.Dense(4 * d, name="fc1")(h2)))
        extras = {}
        if return_keys:
            extras["key"] = k.reshape(b, t, d)
        if return_attn:
            extras["attn"] = att  # (B, heads, T, T)
        return x, extras


class ViT(nn.Module):
    """Minimal ViT trunk: conv patch-embed (stride-adjustable), cls token,
    interpolated pos-embed, N blocks."""

    dim: int = 384  # vits
    depth: int = 12
    heads: int = 6
    patch: int = 8
    stride: int = 8
    pos_grid: int = 28  # native pos-embed grid (224/8)

    @nn.compact
    def __call__(self, x: jnp.ndarray, harvest_layers: Sequence[int] = (11,), facet: str = "key"):
        b, h, w, c = x.shape
        feat = nn.Conv(self.dim, (self.patch, self.patch), strides=(self.stride, self.stride),
                       padding="VALID", name="patch_embed")(x)
        gh, gw = feat.shape[1], feat.shape[2]
        tokens = feat.reshape(b, gh * gw, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.pos_grid * self.pos_grid + 1, self.dim))
        # re-interpolate patch pos-embed to the actual grid (dino.py _fix_pos_enc)
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        pos_patch = pos_patch.reshape(1, self.pos_grid, self.pos_grid, self.dim)
        pos_patch = jax.image.resize(pos_patch, (1, gh, gw, self.dim), "bicubic")
        pos_patch = pos_patch.reshape(1, gh * gw, self.dim)
        tokens = jnp.concatenate([jnp.tile(cls, (b, 1, 1)), tokens], axis=1)
        tokens = tokens + jnp.concatenate([pos_cls, pos_patch], axis=1)

        harvested: List[jnp.ndarray] = []
        for i in range(self.depth):
            want = i in harvest_layers
            tokens, extras = _ViTBlock(self.dim, self.heads, name=f"block_{i}")(
                tokens, return_keys=want and facet == "key", return_attn=want and facet == "attn"
            )
            if want:
                if facet == "attn":
                    harvested.append(extras["attn"])  # raw (B, heads, T, T)
                else:
                    src = extras["key"] if facet == "key" else tokens
                    harvested.append(src[:, 1:].reshape(b, gh, gw, self.dim))  # drop cls
        return harvested


class ViTExtractor:
    """Dense per-layer feature maps from images, for UNet feature-concat
    conditioning (condition_encoder.py DinoViT)."""

    def __init__(self, model_type: str = "vits8", stride: int = 8, weights_path: Optional[str] = None):
        dim, heads = (384, 6) if "vits" in model_type else (768, 12)
        patch = 8 if model_type.endswith("8") else 16
        self.vit = ViT(dim=dim, heads=heads, patch=patch, stride=stride, pos_grid=224 // patch)
        self.params = None
        self.weights_path = weights_path

    def init(self, key, image_hw=(224, 224)):
        x = jnp.zeros((1, *image_hw, 3))
        self.params = self.vit.init(key, x)
        if self.weights_path:
            self._load_torch_weights(self.weights_path)
        return self.params

    def _load_torch_weights(self, path: str) -> None:
        import torch

        sd = torch.load(path, map_location="cpu")
        sd = sd.get("state_dict", sd) if isinstance(sd, dict) else sd
        p = jax.device_get(self.params)["params"]
        def put(dst, src):
            a = np.asarray(src)
            return a if a.shape == dst.shape else dst
        for i in range(self.vit.depth):
            blk = p.get(f"block_{i}")
            if blk is None:
                continue
            pre = f"blocks.{i}."
            if pre + "attn.qkv.weight" in sd:
                blk["qkv"]["kernel"] = put(blk["qkv"]["kernel"], sd[pre + "attn.qkv.weight"].T)
                blk["qkv"]["bias"] = put(blk["qkv"]["bias"], sd[pre + "attn.qkv.bias"])
                blk["proj"]["kernel"] = put(blk["proj"]["kernel"], sd[pre + "attn.proj.weight"].T)
                blk["proj"]["bias"] = put(blk["proj"]["bias"], sd[pre + "attn.proj.bias"])
                blk["fc1"]["kernel"] = put(blk["fc1"]["kernel"], sd[pre + "mlp.fc1.weight"].T)
                blk["fc1"]["bias"] = put(blk["fc1"]["bias"], sd[pre + "mlp.fc1.bias"])
                blk["fc2"]["kernel"] = put(blk["fc2"]["kernel"], sd[pre + "mlp.fc2.weight"].T)
                blk["fc2"]["bias"] = put(blk["fc2"]["bias"], sd[pre + "mlp.fc2.bias"])
                blk["norm1"]["scale"] = put(blk["norm1"]["scale"], sd[pre + "norm1.weight"])
                blk["norm1"]["bias"] = put(blk["norm1"]["bias"], sd[pre + "norm1.bias"])
                blk["norm2"]["scale"] = put(blk["norm2"]["scale"], sd[pre + "norm2.weight"])
                blk["norm2"]["bias"] = put(blk["norm2"]["bias"], sd[pre + "norm2.bias"])
        if "patch_embed.proj.weight" in sd:
            p["patch_embed"]["kernel"] = put(
                p["patch_embed"]["kernel"], np.transpose(sd["patch_embed.proj.weight"].numpy(), (2, 3, 1, 0))
            )
            p["patch_embed"]["bias"] = put(p["patch_embed"]["bias"], sd["patch_embed.proj.bias"])
        if "pos_embed" in sd:
            p["pos_embed"] = put(p["pos_embed"], sd["pos_embed"])
        if "cls_token" in sd:
            p["cls_token"] = put(p["cls_token"], sd["cls_token"])
        self.params = jax.device_put({"params": p})

    def extract(self, images: jnp.ndarray, layers: Sequence[int] = (11,), facet: str = "key"):
        """(B, H, W, 3) -> list of (B, gh, gw, D) feature maps."""
        assert self.params is not None, "call init() first"
        return self.vit.apply(self.params, images, harvest_layers=tuple(layers), facet=facet)

    def extract_descriptors(
        self, images: jnp.ndarray, layer: int = 11, facet: str = "key",
        log_bin: bool = False, hierarchy: int = 2,
    ) -> jnp.ndarray:
        """Dense descriptors (B, gh, gw, D') — with `log_bin`, the
        reference's log-binned descriptor (dino.py:231-279, 281-320):
        1 + 8*hierarchy spatial bins per location — level k in [0,
        hierarchy) avg-pools the map with a 3^k window (border counts
        exclude padding) and samples the 8 neighbours at offset 3^k (the
        centre only at k=0), clamped at the borders; bins concatenate
        along channels, so D' = D * (1 + 8*hierarchy)."""
        x = self.extract(images, layers=(layer,), facet=facet)[0]  # (B, gh, gw, D)
        if not log_bin:
            return x
        b, gh, gw, d = x.shape
        planes = []
        for k in range(hierarchy):
            win = 3 ** k
            if win == 1:
                pooled = x
            else:
                # count_include_pad=False average: sum window / valid count
                ssum = jax.lax.reduce_window(
                    x, 0.0, jax.lax.add, (1, win, win, 1), (1, 1, 1, 1), "SAME"
                )
                cnt = jax.lax.reduce_window(
                    jnp.ones((1, gh, gw, 1), x.dtype), 0.0, jax.lax.add,
                    (1, win, win, 1), (1, 1, 1, 1), "SAME",
                )
                pooled = ssum / cnt
            for di in (-win, 0, win):
                for dj in (-win, 0, win):
                    if di == 0 and dj == 0 and k != 0:
                        continue  # centre bin only once, at the finest level
                    iy = jnp.clip(jnp.arange(gh) + di, 0, gh - 1)
                    ix = jnp.clip(jnp.arange(gw) + dj, 0, gw - 1)
                    planes.append(pooled[:, iy][:, :, ix])
        return jnp.concatenate(planes, axis=-1)

    def extract_saliency_maps(self, images: jnp.ndarray, head_idxs: Sequence[int] = (0, 2, 4, 5)) -> jnp.ndarray:
        """(B, H, W, 3) -> (B, gh, gw) saliency in [0, 1]: last-layer
        cls→patch attention averaged over `head_idxs`, min-max normalised
        per image (dino.py:322-342 extract_saliency_maps)."""
        assert self.params is not None, "call init() first"
        att = self.vit.apply(
            self.params, images, harvest_layers=(self.vit.depth - 1,), facet="attn"
        )[0]  # (B, heads, T, T)
        heads = [h for h in head_idxs if h < att.shape[1]] or list(range(att.shape[1]))
        cls_attn = att[:, jnp.asarray(heads), 0, 1:].mean(axis=1)  # (B, T-1)
        lo = cls_attn.min(axis=1, keepdims=True)
        hi = cls_attn.max(axis=1, keepdims=True)
        sal = (cls_attn - lo) / jnp.maximum(hi - lo, 1e-12)
        b, t1 = sal.shape
        # patch grid from the actual input size (stride-adjusted)
        gh = 1 + (images.shape[1] - self.vit.patch) // self.vit.stride
        gw = 1 + (images.shape[2] - self.vit.patch) // self.vit.stride
        return sal.reshape(b, gh, gw)
