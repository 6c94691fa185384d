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
from .autoencoder import AutoencoderKL, VQModel
from .slice_ldm import SliceLDM, _minmax_slice

__all__ = ["LatentSliceLDM"]


def _stage_encode(stage, params, x: jnp.ndarray, key: Optional[jax.Array] = None) -> jnp.ndarray:
    """First-stage encode for either AE family: KL posterior sample/mode
    (ddpm.py:718-741), or the continuous PRE-quant latent for a VQ stage
    (VQModelInterface.encode, autoencoder.py:288-291 — the diffusion space
    of a VQ-first-stage LDM is h before the codebook)."""
    if isinstance(stage, VQModel):
        return stage.apply(params, x, method=stage.encode_prequant)
    posterior = stage.apply(params, x, method=stage.encode)
    return posterior.sample(key) if key is not None else posterior.mode()


def _stage_decode(stage, params, z: jnp.ndarray) -> jnp.ndarray:
    """First-stage decode: plain for KL; THROUGH the codebook for VQ
    (decode_first_stage routes VQModelInterface.decode with
    force_not_quantize=False, ddpm.py:744-767 + autoencoder.py:293-301)."""
    if isinstance(stage, VQModel):
        return stage.apply(params, z, method=stage.decode_prequant)
    return stage.apply(params, z, method=stage.decode)


@dataclass(frozen=True)
class LatentSliceLDM:
    """SliceLDM whose sample/loss space is the AE latent.

    `cond_stage` is the separate 2-channel [prev-slice, mask-slice]
    encoder of the reference `_ae` config
    (ruijin-ldm_from_controlnet_ae.yaml:68-96: a second AutoencoderKL
    whose latent concatenates with the image latent, UNet in_channels =
    4 + 4); when None, conditions are assumed pre-encoded."""

    inner: SliceLDM
    first_stage: "AutoencoderKL | VQModel"
    cond_stage: "Optional[AutoencoderKL | VQModel]" = None
    scale_factor: float = 1.0

    @classmethod
    def create(
        cls,
        first_stage: "AutoencoderKL | VQModel",
        cond_stage: "Optional[AutoencoderKL | VQModel]" = None,
        scale_factor: float = 1.0,
        **ldm_kwargs,
    ) -> "LatentSliceLDM":
        return cls(
            inner=SliceLDM.create(**ldm_kwargs), first_stage=first_stage,
            cond_stage=cond_stage, scale_factor=scale_factor,
        )

    @property
    def diffusion(self) -> GaussianDiffusion:
        return self.inner.diffusion

    # -- first stage (frozen) ---------------------------------------------

    def encode(self, ae_params, x: jnp.ndarray, key: Optional[jax.Array] = None) -> jnp.ndarray:
        """x -> scaled latent (KL: mode unless key given, ddpm.py:718-741;
        VQ: pre-quant h, VQModelInterface semantics)."""
        return self.scale_factor * _stage_encode(self.first_stage, ae_params, x, key)

    def decode(self, ae_params, z: jnp.ndarray) -> jnp.ndarray:
        return _stage_decode(self.first_stage, ae_params, z / self.scale_factor)

    def encode_cond(self, cond_ae_params, cond: jnp.ndarray) -> jnp.ndarray:
        """Pixel-space condition -> cond latent via the cond-stage AE
        (get_learned_conditioning with a first-stage cond encoder,
        ddpm.py:556-568; NOT rescaled by scale_factor, which applies only
        to the diffusion latent)."""
        stage = self.cond_stage or self.first_stage
        return _stage_encode(stage, cond_ae_params, cond)

    # -- tiled first stage (fold/unfold big-image inference) -----------------

    def encode_tiled(self, ae_params, x: jnp.ndarray, patch: Tuple[int, int], stride: Tuple[int, int]) -> jnp.ndarray:
        """Patch-tiled encode with border-weighted stitching in latent space
        (ddpm.py:904-1005 fold/unfold routing, df = the AE downsample factor)."""
        from ..ops.tiling import tiled_apply

        f = self.first_stage.downsample_factor
        fn = lambda tile: _stage_encode(self.first_stage, ae_params, tile)
        z = tiled_apply(fn, x, patch, stride, out_channels=self.first_stage.embed_dim, out_scale=1.0 / f)
        return self.scale_factor * z

    def decode_tiled(self, ae_params, z: jnp.ndarray, patch: Tuple[int, int], stride: Tuple[int, int]) -> jnp.ndarray:
        """Patch-tiled decode (patch/stride given in LATENT pixels; uf = f)."""
        from ..ops.tiling import tiled_apply

        f = self.first_stage.downsample_factor
        fn = lambda tile: _stage_decode(self.first_stage, ae_params, tile)
        return tiled_apply(
            fn, z / self.scale_factor, patch, stride,
            out_channels=self.first_stage.out_ch, out_scale=float(f),
        )

    def make_quantize_fn(self, ae_params):
        """quantize_denoised hook for the ancestral samplers: with a VQ
        first stage, snap each pred_x0 to the codebook before the posterior
        (p_sample's quantize_denoised, ddpm.py:1092-1106).  None for KL
        stages.  Unlike the reference — which quantizes the SCALED latent
        directly — this unscales → quantizes → rescales, so the codebook
        sees the space it was trained in."""
        if not isinstance(self.first_stage, VQModel):
            return None

        def fn(x0):
            h = x0 / self.scale_factor
            zq = self.first_stage.apply(ae_params, h, method=lambda m, hh: m.quantize(hh)[0])
            return self.scale_factor * zq

        return fn

    def calibrate_scale_factor(self, ae_params, batch_x: jnp.ndarray) -> "LatentSliceLDM":
        """scale_by_std: scale_factor = 1/std of the encoded batch
        (ddpm.py:484-499), returning a recalibrated model."""
        z = _stage_encode(self.first_stage, ae_params, batch_x)
        return replace(self, scale_factor=float(1.0 / jnp.std(z)))

    # -- training loss ------------------------------------------------------

    def train_loss_inputs(self, ae_params, key, batch_image, batch_cond=None,
                          cond_ae_params=None):
        """Prepare (z0, cond_latent) for make_ldm_train_step-style losses.
        The image goes through the first stage (sampled posterior,
        scale_factor-scaled — get_input, ddpm.py:662-715); the condition
        goes through `encode_cond` (cond-stage AE, mode, UNSCALED — the
        get_learned_conditioning path, ddpm.py:556-568) so the cond
        distribution the UNet trains on is exactly what sample_volume /
        sample_slice feed at inference."""
        z0 = self.encode(ae_params, batch_image, key)
        cond_z = None
        if batch_cond is not None:
            cond_z = self.encode_cond(
                cond_ae_params if cond_ae_params is not None else ae_params, batch_cond)
        return z0, cond_z

    # -- sampling -------------------------------------------------------------

    def sample_slice(
        self,
        params,
        ae_params,
        key: jax.Array,
        cond: jnp.ndarray,  # PIXEL-space condition (encoded internally)
        ddim: DDIMParams,
        cond_ae_params=None,
        encode_cond: bool = True,
        **kw,
    ) -> jnp.ndarray:
        cond_z = (
            self.encode_cond(cond_ae_params if cond_ae_params is not None else ae_params, cond)
            if encode_cond else cond
        )
        out = self.inner.sample_slice(params, key, cond_z, ddim, **kw)
        if kw.get("return_intermediates"):
            # intermediates are LATENT pred_x0 rows; decode only the sample
            z, inter = out
            return self.decode(ae_params, z), inter
        return self.decode(ae_params, out)

    # -- autoregressive latent-path volume (the `_ae` capability) -------------

    def sample_volume(
        self,
        params,
        ae_params,
        key: jax.Array,
        mask_volume: jnp.ndarray,  # (B, D, H, W, 1) pixel-space mask channel
        ddim: DDIMParams,
        cond_ae_params=None,
        context: Optional[jnp.ndarray] = None,
        init_slice: Optional[jnp.ndarray] = None,
        guidance_scale: float = 1.0,
        warm_start: Optional[float] = None,
        sampler: str = "ddim",
    ) -> jnp.ndarray:
        """Latent-space equivalent of SliceLDM.sample_volume — the
        reference's sample_cond drive with a first stage
        (sample_diffusion.py:196-224 + ddpm.py:510-537): per z-slice the
        PIXEL-space [prev generated slice, mask slice] pair is encoded by
        the cond stage, the DDIM chain runs in latent space, the slice is
        decoded by the first stage and min-max normalised
        (sample_diffusion.py:221-222) before becoming the next condition.
        Whole volume = one lax.scan program; a CFG scale rides the carry
        as a traced input (one program for all scale values).

        `warm_start=f` ∈ (0, 1] (beyond-reference): slice z>0 starts its
        DDIM chain in LATENT space from the previous slice's raw latent
        noised to the round(f·S)-th subset level and runs only those last
        steps (SliceLDM.sample_volume docstring); per-slice cost ~f of the
        full chain.  Default None = exact reference semantics.

        `sampler='dpm'` ('plms') runs the LATENT chain with a multistep
        ODE solver at reference semantics (pure noise per slice) — see
        SliceLDM.sample_volume; `warm_start` composes (the solver runs
        only its last round(f·S) nodes from the q-noised previous
        latent), compounding the two speedups."""
        SliceLDM._check_sampler(sampler, None, ddim)
        b, d, h, w, _ = mask_volume.shape
        if init_slice is None:
            init_slice = jnp.zeros((b, h, w, self.first_stage.out_ch))
        if cond_ae_params is None:
            cond_ae_params = ae_params
        use_cfg = not (isinstance(guidance_scale, (int, float)) and guidance_scale == 1.0)
        gs = jnp.asarray(guidance_scale, jnp.float32) if use_cfg else None
        warm = SliceLDM.warm_start_index(ddim, warm_start)
        mask_zfirst = jnp.moveaxis(mask_volume, 1, 0)

        if warm is None:
            def body(carry, mask_slice):
                if use_cfg:
                    prev, k, gs_c = carry
                else:
                    (prev, k), gs_c = carry, 1.0
                k, sub = jax.random.split(k)
                s, _ = self._volume_slice_step(params, ae_params, cond_ae_params,
                                               prev, mask_slice, sub, ddim, context=context,
                                               guidance_scale=gs_c, sampler=sampler)
                return ((s, k, gs_c) if use_cfg else (s, k)), s

            init = (init_slice, key, gs) if use_cfg else (init_slice, key)
            _, slices = jax.lax.scan(body, init, mask_zfirst)
            return jnp.moveaxis(slices, 0, 1)  # (B, D, H, W, C)

        # warm-start path: slice 0 full chain, slices 1… carry the previous
        # RAW latent and run the short chain from its q-noised version
        key, k0 = jax.random.split(key)
        s0, zraw0 = self._volume_slice_step(params, ae_params, cond_ae_params,
                                            init_slice, mask_zfirst[0], k0, ddim,
                                            context=context,
                                            guidance_scale=gs if use_cfg else 1.0,
                                            sampler=sampler)

        def body(carry, mask_slice):
            if use_cfg:
                prev, zraw, k, gs_c = carry
            else:
                (prev, zraw, k), gs_c = carry, 1.0
            k, sub = jax.random.split(k)
            s, zr = self._volume_slice_step(params, ae_params, cond_ae_params,
                                            prev, mask_slice, sub, ddim, context=context,
                                            guidance_scale=gs_c,
                                            prev_raw=zraw, warm_index=warm,
                                            sampler=sampler)
            return ((s, zr, k, gs_c) if use_cfg else (s, zr, k)), s

        init = (s0, zraw0, key, gs) if use_cfg else (s0, zraw0, key)
        _, slices = jax.lax.scan(body, init, mask_zfirst[1:])
        slices = jnp.concatenate([s0[None], slices], axis=0)
        return jnp.moveaxis(slices, 0, 1)  # (B, D, H, W, C)

    def _volume_slice_step(self, params, ae_params, cond_ae_params,
                           prev, mask_slice, k, ddim, context=None,
                           guidance_scale=1.0, prev_raw=None,
                           warm_index: Optional[int] = None,
                           sampler: str = "ddim"):
        """One latent-path z-step (cond-stage encode → latent DDIM chain →
        first-stage decode → per-slice min-max normalisation,
        sample_diffusion.py:221-222) — shared by sample_volume's scan body
        and stream_volume.  Returns (normalised pixel slice, RAW latent) —
        the raw latent is the warm-start x0 guess for the next slice; with
        `warm_index=k` and `prev_raw` (a latent) given, the chain starts at
        index k-1 from the q-noised prev_raw.

        With CFG on, the unconditional branch uses the ENCODING of the
        zeroed pixel condition (what "no condition" means in pixel space),
        not the zero latent — cond-stage encoders do not map zero images
        to zero latents, so the zero latent would be an off-manifold
        uncond input."""
        cond_pix = jnp.concatenate([prev, mask_slice], axis=-1)
        cond_z = self.encode_cond(cond_ae_params, cond_pix)
        use_cfg = not (isinstance(guidance_scale, (int, float)) and guidance_scale == 1.0)
        uncond_z = None
        if use_cfg:
            # loop-invariant: XLA hoists this single encode out of the
            # inner DDIM scan
            uncond_z = self.encode_cond(cond_ae_params, jnp.zeros_like(cond_pix))
        x_T = start = None
        if warm_index is not None and prev_raw is not None:
            k, ke = jax.random.split(k)
            a = ddim.alphas[warm_index - 1]
            eps = jax.random.normal(ke, prev_raw.shape, prev_raw.dtype)
            x_T = jnp.sqrt(a) * prev_raw + jnp.sqrt(1.0 - a) * eps
            start = warm_index
        if sampler != "ddim":
            z = self.inner._sample_slice_multistep(params, k, cond_z, ddim, sampler,
                                                   context=context,
                                                   guidance_scale=guidance_scale,
                                                   uncond_cond=uncond_z,
                                                   x_T=x_T, start_index=start)
        else:
            z = self.inner.sample_slice(params, k, cond_z, ddim, context=context,
                                        guidance_scale=guidance_scale,
                                        uncond_cond=uncond_z,
                                        x_T=x_T, start_index=start)
        return _minmax_slice(self.decode(ae_params, z)), z

    def stream_volume(
        self,
        params,
        ae_params,
        key: jax.Array,
        mask_volume: jnp.ndarray,  # (B, D, H, W, 1)
        ddim: DDIMParams,
        cond_ae_params=None,
        context: Optional[jnp.ndarray] = None,
        init_slice: Optional[jnp.ndarray] = None,
        guidance_scale: float = 1.0,
        warm_start: Optional[float] = None,
        sampler: str = "ddim",
    ):
        """Generator over z yielding each decoded (B, H, W, C) slice —
        latent-path twin of SliceLDM.stream_volume (shared
        _volume_slice_step incl. `warm_start` and `sampler`; the jitted
        per-slice programs are cached on the instance, keyed by CFG
        ON/OFF, warm index, and sampler only — the scale itself is a
        traced argument, so varying it never retraces)."""
        SliceLDM._check_sampler(sampler, None, ddim)
        b, d, h, w, _ = mask_volume.shape
        if init_slice is None:
            init_slice = jnp.zeros((b, h, w, self.first_stage.out_ch))
        if cond_ae_params is None:
            cond_ae_params = ae_params
        use_cfg = not (isinstance(guidance_scale, (int, float)) and guidance_scale == 1.0)
        warm = SliceLDM.warm_start_index(ddim, warm_start)

        cache = self.__dict__.setdefault("_stream_jit_cache", {})

        def get_fn(warm_index):
            fn = cache.get(("latent", use_cfg, warm_index, sampler))
            if fn is None:
                def fn(params, ae_params, cond_ae_params, prev, prev_raw, mask_slice,
                       k, ddim, context, gs):
                    return self._volume_slice_step(params, ae_params, cond_ae_params,
                                                   prev, mask_slice, k, ddim, context=context,
                                                   guidance_scale=gs if use_cfg else 1.0,
                                                   prev_raw=prev_raw, warm_index=warm_index,
                                                   sampler=sampler)

                fn = cache[("latent", use_cfg, warm_index, sampler)] = jax.jit(fn)
            return fn

        gs = jnp.asarray(guidance_scale, jnp.float32)
        prev, prev_raw = init_slice, None
        for z in range(d):
            key, sub = jax.random.split(key)
            fn = get_fn(warm if (warm is not None and z > 0) else None)
            prev, raw = fn(params, ae_params, cond_ae_params, prev, prev_raw,
                           mask_volume[:, z], sub, ddim, context, gs)
            # keep prev_raw=None when warm start is off so every slice hits
            # the SAME jitted signature (a tensor here would retrace the
            # cold program once with an unused argument)
            prev_raw = raw if warm is not None else None
            yield prev
