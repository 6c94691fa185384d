"""DDIM sampler parameters and single-step update.

Re-derivation of ldm/models/diffusion/ddim.py:24-53 (schedule) and :168-205
(p_sample_ddim), as pure precomputed pytrees + a pure step function, so the
whole sampling loop compiles into one `lax.scan` (see models/slice_ldm.py)
instead of the reference's per-step Python dispatch with buffers registered
on first use.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import schedules as _sched
from .gaussian import GaussianDiffusion

__all__ = ["DDIMParams", "ddim_step"]


@struct.dataclass
class DDIMParams:
    """Per-subset-step arrays, index 0 = earliest (least noisy) step."""

    timesteps: jnp.ndarray  # (S,) int32, values in [1, T] (reference's +1 offset)
    alphas: jnp.ndarray  # (S,) ᾱ at each subset step
    alphas_prev: jnp.ndarray
    sqrt_one_minus_alphas: jnp.ndarray
    sigmas: jnp.ndarray

    @classmethod
    def create(
        cls,
        diffusion: GaussianDiffusion,
        num_steps: int,
        method: str = "uniform",
        eta: float = 0.0,
        dtype=jnp.float32,
    ):
        if num_steps >= diffusion.num_timesteps:
            # the +1 subset-offset convention (util.py:57-60) indexes
            # alphas_cumprod[T] when S == T — an opaque IndexError otherwise;
            # a full-length chain is what the ancestral p_sample_loop does
            raise ValueError(
                f"ddim subset needs num_steps < timesteps (got {num_steps} vs "
                f"{diffusion.num_timesteps}); use SliceLDM.p_sample_loop for a "
                "full-length chain")
        ac = np.asarray(diffusion.alphas_cumprod, np.float64)
        subset = _sched.ddim_timestep_subset(method, num_steps, diffusion.num_timesteps,
                                             alphas_cumprod=ac)
        if int(subset.max()) >= diffusion.num_timesteps:
            # the 'uniform' stride is floor(T/S), so any S > T//2 strides by 1
            # and the +1 offset runs past alphas_cumprod[T-1] (the reference
            # has the same latent constraint, util.py:46-60 + ddim.py:34-36)
            raise ValueError(
                f"ddim subset with method={method!r} and num_steps={num_steps} "
                f"reaches timestep {int(subset.max())} ≥ T={diffusion.num_timesteps} "
                "(the +1 subset-offset convention); choose num_steps ≤ T//2, or "
                "use SliceLDM.p_sample_loop for a full-length chain")
        sigmas, alphas, alphas_prev = _sched.ddim_sampling_parameters(ac, subset, eta)
        j = lambda x: jnp.asarray(x, dtype)
        return cls(
            timesteps=jnp.asarray(subset, jnp.int32),
            alphas=j(alphas),
            alphas_prev=j(alphas_prev),
            sqrt_one_minus_alphas=j(np.sqrt(1.0 - alphas)),
            sigmas=j(sigmas),
        )

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]


def ddim_step(
    params: DDIMParams,
    key: jax.Array,
    x: jnp.ndarray,
    e_t: jnp.ndarray,
    index: jnp.ndarray,
    temperature: float = 1.0,
):
    """One DDIM update x_t -> x_{t-1} given the eps prediction e_t.

    `index` selects into the subset arrays (ddim.py:182-205).  Returns
    (x_prev, pred_x0).
    """
    shape = (1,) * x.ndim
    a_t = params.alphas[index].reshape(shape)
    a_prev = params.alphas_prev[index].reshape(shape)
    sigma_t = params.sigmas[index].reshape(shape)
    sqrt_om_at = params.sqrt_one_minus_alphas[index].reshape(shape)

    pred_x0 = (x - sqrt_om_at * e_t) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * e_t
    noise = sigma_t * jax.random.normal(key, x.shape, x.dtype) * temperature
    x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise
    return x_prev, pred_x0
