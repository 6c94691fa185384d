"""First-stage autoencoders: AutoencoderKL and VQModel (dims ∈ {2, 3}).

Re-design of latentdiffusion/ldm/models/autoencoder.py:18-482 +
ldm/modules/distributions/distributions.py:24-92.  The LightningModule
optimizer_idx dance (autoencoder.py:385-429) becomes two pure losses
(generator / discriminator) consumed by the dual-optimizer train step in
train/gan.py."""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import _conv
from ..nn.vae import Decoder, Encoder, VectorQuantizer

__all__ = ["DiagonalGaussian", "AutoencoderKL", "VQModel"]


class DiagonalGaussian(NamedTuple):
    """moments (…, 2*C) -> mean/logvar helpers (distributions.py:24-62)."""

    mean: jnp.ndarray
    logvar: jnp.ndarray

    @classmethod
    def from_moments(cls, moments: jnp.ndarray) -> "DiagonalGaussian":
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return cls(mean, jnp.clip(logvar, -30.0, 20.0))

    def sample(self, key: jax.Array) -> jnp.ndarray:
        std = jnp.exp(0.5 * self.logvar)
        return self.mean + std * jax.random.normal(key, self.mean.shape, self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        """KL to N(0, I), summed over non-batch dims (distributions.py:49-57)."""
        val = 0.5 * (self.mean**2 + jnp.exp(self.logvar) - 1.0 - self.logvar)
        return jnp.sum(val, axis=tuple(range(1, val.ndim)))

    def nll(self, sample: jnp.ndarray) -> jnp.ndarray:
        logtwopi = jnp.log(2.0 * jnp.pi)
        val = 0.5 * (logtwopi + self.logvar + (sample - self.mean) ** 2 / jnp.exp(self.logvar))
        return jnp.sum(val, axis=tuple(range(1, val.ndim)))


class AutoencoderKL(nn.Module):
    """encode -> quant_conv -> DiagonalGaussian; decode <- post_quant_conv."""

    embed_dim: int = 4
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    z_channels: int = 4
    in_channels: int = 1
    out_ch: int = 1
    dims: int = 2
    dropout: float = 0.0
    resolution: int = 512
    attn_type: str = "vanilla"  # make_attn routing (model.py:264): vanilla|linear|none

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, z_channels=self.z_channels,
            double_z=True, dims=self.dims, dropout=self.dropout, resolution=self.resolution,
            attn_type=self.attn_type,
        )
        self.decoder = Decoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, out_ch=self.out_ch,
            dims=self.dims, dropout=self.dropout, resolution=self.resolution,
            attn_type=self.attn_type,
        )
        self.quant_conv = _conv(2 * self.embed_dim, 1, self.dims, name="quant_conv")
        self.post_quant_conv = _conv(self.z_channels, 1, self.dims, name="post_quant_conv")

    @property
    def downsample_factor(self) -> int:
        """Spatial factor f between pixel and latent space (one 2x per level)."""
        return 2 ** (len(self.ch_mult) - 1)

    def encode(self, x: jnp.ndarray, *, deterministic: bool = True) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(x, deterministic=deterministic))
        return DiagonalGaussian.from_moments(moments)

    def decode(self, z: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z), deterministic=deterministic)

    def __call__(self, x: jnp.ndarray, key: Optional[jax.Array] = None, sample_posterior: bool = True,
                 *, deterministic: bool = True):
        posterior = self.encode(x, deterministic=deterministic)
        z = posterior.sample(key) if (sample_posterior and key is not None) else posterior.mode()
        rec = self.decode(z, deterministic=deterministic)
        return rec, posterior


class VQModel(nn.Module):
    """VQGAN-style quantized autoencoder (autoencoder.py:18-215)."""

    embed_dim: int = 4
    n_embed: int = 8192
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    z_channels: int = 4
    in_channels: int = 1
    out_ch: int = 1
    dims: int = 2
    dropout: float = 0.0
    resolution: int = 256
    attn_type: str = "vanilla"  # make_attn routing (model.py:264): vanilla|linear|none

    def setup(self):
        self.encoder = Encoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, z_channels=self.z_channels,
            double_z=False, dims=self.dims, dropout=self.dropout, resolution=self.resolution,
            attn_type=self.attn_type,
        )
        self.decoder = Decoder(
            ch=self.ch, ch_mult=self.ch_mult, num_res_blocks=self.num_res_blocks,
            attn_resolutions=self.attn_resolutions, out_ch=self.out_ch,
            dims=self.dims, dropout=self.dropout, resolution=self.resolution,
            attn_type=self.attn_type,
        )
        self.quant_conv = _conv(self.embed_dim, 1, self.dims, name="quant_conv")
        self.post_quant_conv = _conv(self.z_channels, 1, self.dims, name="post_quant_conv")
        self.quantize = VectorQuantizer(n_embed=self.n_embed, embed_dim=self.embed_dim)

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)

    def encode(self, x: jnp.ndarray, *, deterministic: bool = True):
        h = self.quant_conv(self.encoder(x, deterministic=deterministic))
        return self.quantize(h)

    def decode(self, zq: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(zq), deterministic=deterministic)

    # -- VQModelInterface semantics (reference autoencoder.py:283-301) --------
    # When a VQ model serves as an LDM first stage, the diffusion runs in
    # the CONTINUOUS pre-quantization latent: encode stops before the
    # codebook lookup and decode routes through it.

    def encode_prequant(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        """x -> pre-quant h (VQModelInterface.encode, autoencoder.py:288-291)."""
        return self.quant_conv(self.encoder(x, deterministic=deterministic))

    def decode_prequant(
        self, h: jnp.ndarray, force_not_quantize: bool = False, *, deterministic: bool = True
    ) -> jnp.ndarray:
        """pre-quant h -> image through the codebook
        (VQModelInterface.decode, autoencoder.py:293-301)."""
        zq = h if force_not_quantize else self.quantize(h)[0]
        return self.decode(zq, deterministic=deterministic)

    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True):
        zq, qloss, idx = self.encode(x, deterministic=deterministic)
        rec = self.decode(zq, deterministic=deterministic)
        return rec, qloss, idx
