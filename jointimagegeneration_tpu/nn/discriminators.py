"""PatchGAN discriminators (2D + 3D).

Equivalent of NLayerDiscriminator / NLayerDiscriminator3D
(latentdiffusion/ldm/modules/losses/contperceptual.py:296-406): stride-2
conv pyramid, LeakyReLU(0.2), channel mult capped at 8, 1-channel logit
map head.  One deliberate change: GroupNorm instead of the reference's
SyncBatchNorm/BatchNorm3d — per-sample normalisation needs no cross-
device stat sync, removing collective traffic from every D step
(SURVEY.md §2.3).  Returns intermediate features for the GAN
feature-matching loss (contperceptual.py:234-250)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import GroupNorm32, _conv

__all__ = ["PatchDiscriminator"]


class PatchDiscriminator(nn.Module):
    dims: int = 2
    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_features: bool = False):
        # k=4 convs with pad 1: input must survive n_layers stride-2 stages
        # plus two stride-1 stages without collapsing to an empty map
        min_size = 2 ** self.n_layers * 4
        spatial = x.shape[1:-1]
        if min(spatial) < min_size:
            raise ValueError(
                f"PatchDiscriminator(n_layers={self.n_layers}) needs spatial >= "
                f"{min_size}, got {spatial}; reduce n_layers for small images"
            )
        feats: List[jnp.ndarray] = []
        h = _conv(self.ndf, 4, self.dims, strides=2, padding=1, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        mult = 1
        for n in range(1, self.n_layers):
            mult = min(2**n, 8)
            h = _conv(self.ndf * mult, 4, self.dims, strides=2, padding=1, name=f"conv{n}")(h)
            h = GroupNorm32(name=f"norm{n}")(h)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)
        mult = min(2**self.n_layers, 8)
        h = _conv(self.ndf * mult, 4, self.dims, strides=1, padding=1, name=f"conv{self.n_layers}")(h)
        h = GroupNorm32(name=f"norm{self.n_layers}")(h)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)
        logits = _conv(1, 4, self.dims, strides=1, padding=1, name="head")(h)
        if return_features:
            return logits, feats
        return logits
