"""Gaussian DDPM process (stage-2 image diffusion).

Re-derivation of the LDM DDPM buffer set and q/p maps
(latentdiffusion/ldm/models/diffusion/ddpm.py:118-170, 226-293) as a pure
pytree.  Channels-last (B, *spatial, C).  All schedule constants are
precomputed in float64 numpy and frozen; everything else is jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import schedules as _sched

__all__ = ["GaussianDiffusion"]


def _bcast(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    g = arr[t]
    return g.reshape(g.shape + (1,) * (ndim - 1))


@struct.dataclass
class GaussianDiffusion:
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    lvlb_weights: jnp.ndarray
    parameterization: str = struct.field(pytree_node=False, default="eps")

    @classmethod
    def create(
        cls,
        beta_schedule: str = "linear",
        timesteps: int = 1000,
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        given_betas: np.ndarray | None = None,
        v_posterior: float = 0.0,
        parameterization: str = "eps",
        dtype=jnp.float32,
    ):
        if given_betas is not None:
            betas = np.asarray(given_betas, np.float64)
        else:
            betas = _sched.gaussian_beta_schedule(
                beta_schedule, timesteps, linear_start=linear_start, linear_end=linear_end, cosine_s=cosine_s
            )
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        ac_prev = np.append(1.0, ac[:-1])
        post_var = (1 - v_posterior) * betas * (1.0 - ac_prev) / (1.0 - ac) + v_posterior * betas
        if parameterization == "eps":
            # post_var[0] == 0 -> lvlb[0] = inf, overwritten below (ddpm.py:168)
            with np.errstate(divide="ignore"):
                lvlb = betas**2 / (2 * post_var * alphas * (1 - ac))
        elif parameterization == "x0":
            lvlb = 0.5 * np.sqrt(ac) / (2.0 * 1 - ac)  # reference's literal expression (ddpm.py:165)
        else:
            raise NotImplementedError(parameterization)
        lvlb[0] = lvlb[1]
        j = lambda x: jnp.asarray(x, dtype)
        return cls(
            betas=j(betas),
            alphas_cumprod=j(ac),
            alphas_cumprod_prev=j(ac_prev),
            sqrt_alphas_cumprod=j(np.sqrt(ac)),
            sqrt_one_minus_alphas_cumprod=j(np.sqrt(1.0 - ac)),
            sqrt_recip_alphas_cumprod=j(np.sqrt(1.0 / ac)),
            sqrt_recipm1_alphas_cumprod=j(np.sqrt(1.0 / ac - 1)),
            posterior_variance=j(post_var),
            posterior_log_variance_clipped=j(np.log(np.maximum(post_var, 1e-20))),
            posterior_mean_coef1=j(betas * np.sqrt(ac_prev) / (1.0 - ac)),
            posterior_mean_coef2=j((1.0 - ac_prev) * np.sqrt(alphas) / (1.0 - ac)),
            lvlb_weights=j(lvlb),
            parameterization=parameterization,
        )

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]

    # -- forward -----------------------------------------------------------

    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """x_t = sqrt(ᾱ_t)·x0 + sqrt(1-ᾱ_t)·ε   (t is 0-based, ddpm.py:273-278)."""
        return (
            _bcast(self.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _bcast(self.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise
        )

    # -- reverse -----------------------------------------------------------

    def predict_start_from_noise(self, x_t: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        return (
            _bcast(self.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _bcast(self.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * noise
        )

    def q_posterior(self, x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray):
        mean = (
            _bcast(self.posterior_mean_coef1, t, x_t.ndim) * x_start
            + _bcast(self.posterior_mean_coef2, t, x_t.ndim) * x_t
        )
        var = _bcast(self.posterior_variance, t, x_t.ndim)
        log_var = _bcast(self.posterior_log_variance_clipped, t, x_t.ndim)
        return mean, var, log_var

    def predict_x0(self, model_out: jnp.ndarray, x: jnp.ndarray, t: jnp.ndarray, clip_denoised: bool = True) -> jnp.ndarray:
        """Model output at (x, t) -> x0 estimate under the configured
        parameterization (the x_recon of p_mean_variance, ddpm.py:322-332)."""
        if self.parameterization == "eps":
            x_recon = self.predict_start_from_noise(x, t, model_out)
        else:
            x_recon = model_out
        if clip_denoised:
            x_recon = jnp.clip(x_recon, -1.0, 1.0)
        return x_recon

    def p_mean_variance(self, model_out: jnp.ndarray, x: jnp.ndarray, t: jnp.ndarray, clip_denoised: bool = True):
        return self.q_posterior(self.predict_x0(model_out, x, t, clip_denoised), x, t)

    def p_sample(self, key: jax.Array, model_out: jnp.ndarray, x: jnp.ndarray, t: jnp.ndarray, clip_denoised: bool = True):
        """Ancestral step given the model output at (x, t) (ddpm.py:334-345)."""
        mean, _, log_var = self.p_mean_variance(model_out, x, t, clip_denoised)
        noise = jax.random.normal(key, x.shape, x.dtype)
        nonzero = (t > 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
        return mean + nonzero * jnp.exp(0.5 * log_var) * noise
