"""DDIM sampler parameters and single-step update.

Re-derivation of ldm/models/diffusion/ddim.py:24-53 (schedule) and :168-205
(p_sample_ddim), as pure precomputed pytrees + a pure step function, so the
whole sampling loop compiles into one `lax.scan` (see models/slice_ldm.py)
instead of the reference's per-step Python dispatch with buffers registered
on first use.
"""

from __future__ import annotations

from typing import NamedTuple

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
        ac = np.asarray(diffusion.alphas_cumprod, np.float64)
        subset = _sched.ddim_timestep_subset(method, num_steps, diffusion.num_timesteps,
                                             alphas_cumprod=ac)
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
