"""Latent diffusion: UNet denoiser inside a frozen first-stage latent space.

The capability of LatentDiffusion-with-first-stage
(ldm/models/diffusion/ddpm.py:429-537, 662-876): encode with a frozen
AutoencoderKL/VQModel, diffuse in latent space, decode samples.  The
primary checked-in config bypasses the first stage
(`__is_no_first_stage__` -> models/slice_ldm.py); this class is the `_ae`
path and milestone config #2 (VQGAN/KL encode/decode + 50-step DDIM).

`scale_factor` handling mirrors `scale_by_std` (ddpm.py:484-499): either
a fixed rescale or calibrated once from the first batch as
1/std(encode(x)) via `calibrate_scale_factor`.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..diffusion.ddim import DDIMParams
from ..diffusion.gaussian import GaussianDiffusion
from ..nn.unet import UNet
from .autoencoder import AutoencoderKL
from .slice_ldm import SliceLDM

__all__ = ["LatentSliceLDM"]


@dataclass(frozen=True)
class LatentSliceLDM:
    """SliceLDM whose sample/loss space is the AE latent."""

    inner: SliceLDM
    first_stage: AutoencoderKL
    scale_factor: float = 1.0

    @classmethod
    def create(cls, first_stage: AutoencoderKL, scale_factor: float = 1.0, **ldm_kwargs) -> "LatentSliceLDM":
        return cls(inner=SliceLDM.create(**ldm_kwargs), first_stage=first_stage, scale_factor=scale_factor)

    @property
    def diffusion(self) -> GaussianDiffusion:
        return self.inner.diffusion

    # -- first stage (frozen) ---------------------------------------------

    def encode(self, ae_params, x: jnp.ndarray, key: Optional[jax.Array] = None) -> jnp.ndarray:
        """x -> scaled latent (mode unless key given; ddpm.py:718-741)."""
        posterior = self.first_stage.apply(ae_params, x, method=self.first_stage.encode)
        z = posterior.sample(key) if key is not None else posterior.mode()
        return self.scale_factor * z

    def decode(self, ae_params, z: jnp.ndarray) -> jnp.ndarray:
        return self.first_stage.apply(ae_params, z / self.scale_factor, method=self.first_stage.decode)

    def calibrate_scale_factor(self, ae_params, batch_x: jnp.ndarray) -> "LatentSliceLDM":
        """scale_by_std: scale_factor = 1/std of the encoded batch
        (ddpm.py:484-499), returning a recalibrated model."""
        z = self.first_stage.apply(ae_params, batch_x, method=self.first_stage.encode).mode()
        return replace(self, scale_factor=float(1.0 / jnp.std(z)))

    # -- training loss ------------------------------------------------------

    def train_loss_inputs(self, ae_params, key, batch_image, batch_cond=None):
        """Prepare (z0, cond_latent) for make_ldm_train_step-style losses:
        both the image and the concat condition live in latent space."""
        kz, kc = jax.random.split(key)
        z0 = self.encode(ae_params, batch_image, kz)
        cond_z = self.encode(ae_params, batch_cond, kc) if batch_cond is not None else None
        return z0, cond_z

    # -- sampling -------------------------------------------------------------

    def sample_slice(
        self,
        params,
        ae_params,
        key: jax.Array,
        cond: jnp.ndarray,  # PIXEL-space condition (encoded internally)
        ddim: DDIMParams,
        latent_hw: Optional[Tuple[int, int]] = None,
        encode_cond: bool = True,
        **kw,
    ) -> jnp.ndarray:
        k1, k2 = jax.random.split(key)
        cond_z = self.encode(ae_params, cond, None) if encode_cond else cond
        z = self.inner.sample_slice(params, k2, cond_z, ddim, **kw)
        return self.decode(ae_params, z)
