"""Noisy-latent classifier (guidance-capable).

Equivalent of ldm/models/diffusion/classifier.py:28-267
(NoisyLatentImageClassifier): a UNet-encoder classifier trained on
diffused latents x_t at sampled t, usable for classifier guidance of the
Gaussian sampler.  Unused by the reference's checked-in configs but part
of its component surface."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..diffusion.gaussian import GaussianDiffusion
from ..nn.blocks import Downsample, GroupNorm32, ResBlock, _conv, timestep_embedding

__all__ = ["NoisyLatentClassifier"]


class _EncoderUNet(nn.Module):
    """Encoder half of the UNet + pooled classification head
    (openaimodel.py EncoderUNetModel:755-964)."""

    model_channels: int
    num_classes: int
    channel_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 1
    dims: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, timesteps: jnp.ndarray) -> jnp.ndarray:
        mc = self.model_channels
        emb = timestep_embedding(timesteps, mc)
        emb = nn.Dense(mc * 4, name="time_embed_0")(emb)
        emb = nn.Dense(mc * 4, name="time_embed_1")(nn.silu(emb))

        h = _conv(mc * self.channel_mult[0], 3, self.dims, name="in_conv")(x)
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = ResBlock(int(mult * mc), dims=self.dims, name=f"down_{level}_{i}")(h, emb)
            if level != len(self.channel_mult) - 1:
                h = Downsample(self.dims, True, name=f"down_{level}_ds")(h)
        h = nn.silu(GroupNorm32(name="out_norm")(h))
        h = jnp.mean(h, axis=tuple(range(1, h.ndim - 1)))  # adaptive avg pool
        return nn.Dense(self.num_classes, name="head")(h)


@dataclass(frozen=True)
class NoisyLatentClassifier:
    net: _EncoderUNet
    diffusion: GaussianDiffusion

    @classmethod
    def create(cls, num_classes: int, diffusion: GaussianDiffusion, model_channels: int = 32,
               channel_mult: Sequence[int] = (1, 2, 4), dims: int = 2):
        return cls(
            net=_EncoderUNet(model_channels=model_channels, num_classes=num_classes,
                             channel_mult=tuple(channel_mult), dims=dims),
            diffusion=diffusion,
        )

    def init_params(self, key, spatial, channels: int = 1):
        return self.net.init(key, jnp.zeros((1, *spatial, channels)), jnp.zeros((1,)))

    def loss(self, params, key, x0, labels):
        """Train on x_t at uniform t (classifier.py get_train_classifier_input)."""
        kt, kn = jax.random.split(key)
        b = x0.shape[0]
        t = jax.random.randint(kt, (b,), 0, self.diffusion.num_timesteps)
        noise = jax.random.normal(kn, x0.shape, x0.dtype)
        xt = self.diffusion.q_sample(x0, t, noise)
        logits = self.net.apply(params, xt, t.astype(jnp.float32))
        loss = -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * jax.nn.one_hot(labels, logits.shape[-1]), -1))
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return loss, {"loss": loss, "acc": acc}

    def guidance_fn(self, params, target_label: int, scale: float = 1.0):
        """∇_x log p(y|x_t) for classifier-guided sampling."""

        def grad_fn(x, t):
            def logp(x):
                logits = self.net.apply(params, x, t.astype(jnp.float32))
                return jnp.sum(jax.nn.log_softmax(logits)[:, target_label])

            return scale * jax.grad(logp)(x)

        return grad_fn
