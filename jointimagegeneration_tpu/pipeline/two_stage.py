"""End-to-end text → mask → CT pipeline.

The reference leaves the stage-1 → stage-2 handoff manual: ddpm_eval
writes pred.nii.gz masks (ccdm/ddpm/evaluator.py:141-148), which are
upsampled offline and re-read by sample_diffusion (README.md:22,
sample_diffusion.py:196-224).  Here the handoff is programmatic and
on-device: mask volume → nearest-neighbour label upsample
(`jax.image.resize`) → per-slice windowed mask channel → autoregressive
stage-2 volume, all inside jit.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..diffusion.ddim import DDIMParams
from ..models.latent_ldm import LatentSliceLDM
from ..models.mask_sampler import MaskSampler
from ..models.slice_ldm import SliceLDM

__all__ = ["TwoStagePipeline", "upsample_labels"]


def upsample_labels(labels: jnp.ndarray, target_shape: Sequence[int]) -> jnp.ndarray:
    """Nearest-neighbour resize of an integer label volume (B, D, H, W).

    Labels must use 'nearest' (interpolating class ids is meaningless);
    equivalent of the reference's offline zoom of the 64×128×128 ccdm mask
    to the stage-2 grid (sample_diffusion.py:199-200)."""
    b = labels.shape[0]
    return jax.image.resize(labels, (b, *target_shape), method="nearest")


def normalize_mask_channel(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Map integer labels into [0,1] as the stage-2 mask condition channel
    (the reference feeds the windowed mask volume as a float channel,
    ruijin_pimage_and_mask.py:141-159)."""
    return labels.astype(jnp.float32)[..., None] / max(num_classes - 1, 1)


@dataclass(frozen=True)
class TwoStagePipeline:
    """`slice_ldm` may be a pixel-space SliceLDM or a LatentSliceLDM (the
    `_ae` config): with a latent model the stage-2 volume runs through its
    cond-stage encode / first-stage decode per slice — the reference's
    sample_cond with a first stage (sample_diffusion.py:196-224 +
    ddpm.py:510-537).  Latent mode REQUIRES `ae_params` at call time."""

    mask_sampler: MaskSampler
    slice_ldm: SliceLDM | LatentSliceLDM

    def __call__(
        self,
        mask_params,
        ldm_params,
        key: jax.Array,
        *,
        mask_shape: Tuple[int, int, int, int],  # (B, D, H, W) of stage 1
        volume_shape: Tuple[int, int, int],  # (D', H', W') of the CT volume
        ddim: DDIMParams,
        mask_steps: Optional[int] = None,
        cond: Optional[jnp.ndarray] = None,
        context: Optional[jnp.ndarray] = None,
        feature_cond: Optional[dict] = None,
        ae_params=None,
        cond_ae_params=None,
        guidance_scale: float = 1.0,
        warm_start: Optional[float] = None,
        sampler: str = "ddim",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (ct_volume (B,D',H',W',C), labels (B,D',H',W'))."""
        if isinstance(self.slice_ldm, LatentSliceLDM) and ae_params is None:
            raise ValueError("latent two-stage pipeline needs ae_params (first-stage AE weights)")
        k1, k2 = jax.random.split(key)
        labels = self.mask_sampler.sample_labels(
            mask_params, k1, mask_shape, cond=cond, context=context,
            feature_cond=feature_cond, num_steps=mask_steps,
        )
        labels_up = upsample_labels(labels, volume_shape)
        mask_channel = normalize_mask_channel(labels_up, self.mask_sampler.num_classes)
        if isinstance(self.slice_ldm, LatentSliceLDM):
            ct = self.slice_ldm.sample_volume(
                ldm_params, ae_params, k2, mask_channel, ddim,
                cond_ae_params=cond_ae_params, context=context,
                guidance_scale=guidance_scale, warm_start=warm_start,
                sampler=sampler,
            )
        else:
            ct = self.slice_ldm.sample_volume(ldm_params, k2, mask_channel, ddim, context=context,
                                              guidance_scale=guidance_scale,
                                              warm_start=warm_start, sampler=sampler)
        return ct, labels_up


def make_chunked_two_stage_programs(mask_sampler: MaskSampler, slice_ldm: SliceLDM, *,
                                    mask_shape: Tuple[int, int, int, int],
                                    volume_shape: Tuple[int, int, int],
                                    ddim: DDIMParams, chunk: int,
                                    mask_steps: Optional[int] = None,
                                    cond: Optional[jnp.ndarray] = None,
                                    with_checksum: bool = False,
                                    full_mask: bool = False,
                                    **sample_kw):
    """Chunked execution of the full two-stage pipeline as jitted programs.

    The fused single-scan pipeline at 128 slices is ~77 s of device time
    in ONE program, which crashes this box's tunneled TPU worker
    (BENCH_NOTES round 4); splitting the z loop into `chunk`-slice
    sample_volume programs — chunk k+1's first slice conditioned on chunk
    k's last generated slice — keeps every dispatch short while preserving
    the exact autoregressive semantics (sample_diffusion.py:208-223).

    Returns (mask_program, chunk_program):
      mask_program(ms_params, key) -> (B, D', H', W', 1) windowed mask channel
      chunk_program(ldm_params, key, mask_chunk, init_slice) -> (vol, last_slice)

    `with_checksum` appends a scalar reduction to each program's outputs
    so a caller can device-sync with a single cheap d2h fetch instead of
    dispatching a separate eager `sum` program (on a tunneled TPU every
    extra one-op program pays a relay round-trip).  `full_mask` moves the
    per-chunk mask slicing INSIDE the chunk program: the chunk then takes
    the whole mask volume plus a traced z-offset, so driving all D/chunk
    chunks reuses ONE compiled program with no eager slicing between
    dispatches:
      chunk_program(ldm_params, key, mask_full, z_start, init_slice)
    """
    d, h, w = volume_shape
    if d % chunk != 0:
        raise ValueError(f"volume depth {d} must divide by chunk {chunk}")

    @jax.jit
    def mask_program(ms_params, key):
        labels = mask_sampler.sample_labels(
            ms_params, key, mask_shape, cond=cond, num_steps=mask_steps)
        up = upsample_labels(labels, (d, h, w))
        mc = normalize_mask_channel(up, mask_sampler.num_classes)
        return (mc, jnp.sum(mc)) if with_checksum else mc

    def _sample_chunk(ldm_params, key, mask_chunk, init_slice):
        vol = slice_ldm.sample_volume(ldm_params, key, mask_chunk, ddim,
                                      init_slice=init_slice, **sample_kw)
        if with_checksum:
            return vol, vol[:, -1], jnp.sum(vol)
        return vol, vol[:, -1]

    if full_mask:
        @jax.jit
        def chunk_program(ldm_params, key, mask_full, z_start, init_slice):
            mask_chunk = jax.lax.dynamic_slice_in_dim(mask_full, z_start, chunk, axis=1)
            return _sample_chunk(ldm_params, key, mask_chunk, init_slice)
    else:
        chunk_program = jax.jit(_sample_chunk)

    return mask_program, chunk_program
