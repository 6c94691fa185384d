"""Categorical (discrete-state) diffusion over one-hot class volumes.

Re-derivation of the ccdm process (reference:
ccdm/ddpm/models/diffusion_denoising.py:42-139) with two deliberate
TPU-first departures:

1. **Channels-last.** Class probabilities live on the trailing axis
   (B, *spatial, C) so the class dim maps onto TPU lanes and elementwise
   math over it vectorises on the VPU.

2. **Closed-form posterior contraction.** The reference evaluates
   q(x_{t-1} | x_t, x0-distribution) by materialising the full C×C
   transition tensor per voxel and contracting with
   einsum("bcdlhw,bdlhw->bclhw") (diffusion_denoising.py:105-139) — a
   [B,C,C,D,H,W] intermediate (≈600 MB at C=12, 64×128×128 fp32).
   Because every transition matrix here is a convex combination of the
   identity and the uniform matrix,

       theta_{x_{t-1}|x0}[i,j]   = ca·δ_ij + (1-ca)/C        (ca = cumalphas[t-2])
       theta_{x_t|x_{t-1}}[b,i]  = a·x_t[b,i] + (1-a)/C      (a  = alphas[t-1])

   the contraction collapses algebraically:

       aux[b,i,j]   = p[b,i] · (ca·δ_ij + (1-ca)/C)          (p = theta_{x_t|x_{t-1}})
       denom[b,j]   = Σ_i aux[b,i,j] = ca·p[b,j] + (1-ca)/C · Σ_i p[b,i]
       out[b,i]     = Σ_j aux[b,i,j]/denom[b,j] · θx0[b,j]
                    = p[b,i] · ( ca·r[b,i] + (1-ca)/C · Σ_j r[b,j] ),   r = θx0/denom

   i.e. O(C) work and O(B·S·C) memory — no C×C tensor ever exists.  This
   is exact (verified against the brute-force einsum in
   tests/test_categorical.py) and makes the per-step posterior cost
   negligible next to the UNet forward.

All `t` arguments use the reference's 1-based convention: t ∈ [1, T],
arrays are indexed at t-1, and the t==1 boundary pins alphas→0,
cumalphas_prev→1 exactly as diffusion_denoising.py:99-100,121-122.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..ops import schedules as _sched

__all__ = ["CategoricalDiffusion"]


def _gather_t(arr: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """arr[t] broadcast to an ndim-rank tensor with batch leading."""
    g = arr[t]
    return g.reshape(g.shape + (1,) * (ndim - 1))


@struct.dataclass
class CategoricalDiffusion:
    """Pure pytree of schedule constants + the categorical process maps."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    cumalphas: jnp.ndarray
    num_classes: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, schedule: str, time_steps: int, num_classes: int, dtype=jnp.float32, **schedule_params):
        arrs = _sched.make_categorical_schedule(schedule, time_steps, **schedule_params)
        return cls(
            betas=jnp.asarray(arrs.betas, dtype),
            alphas=jnp.asarray(arrs.alphas, dtype),
            cumalphas=jnp.asarray(arrs.cumalphas, dtype),
            num_classes=num_classes,
        )

    @property
    def time_steps(self) -> int:
        return self.betas.shape[0]

    # -- forward process ---------------------------------------------------

    def q_xt_given_xtm1_probs(self, xtm1: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """Single-step forward kernel probs (diffusion_denoising.py:73-80)."""
        betas = _gather_t(self.betas, t - 1, xtm1.ndim)
        return (1.0 - betas) * xtm1 + betas / self.num_classes

    def q_xt_given_x0_probs(self, x0: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """Marginal forward kernel probs (diffusion_denoising.py:82-89)."""
        ca = _gather_t(self.cumalphas, t - 1, x0.ndim)
        return ca * x0 + (1.0 - ca) / self.num_classes

    def sample_q_xt_given_x0(self, key: jax.Array, x0: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        probs = self.q_xt_given_x0_probs(x0, t)
        return sample_one_hot(key, probs)

    # -- reverse process ---------------------------------------------------

    def _boundary_coeffs(self, t: jnp.ndarray, ndim: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(alphas[t-1], cumalphas[t-2]) with the t==1 overrides applied."""
        idx = t - 1
        a = self.alphas[idx]
        ca_prev = self.cumalphas[idx - 1]  # idx-1 == -1 at t==1; overridden below
        is_t1 = idx == 0
        a = jnp.where(is_t1, 0.0, a)
        ca_prev = jnp.where(is_t1, 1.0, ca_prev)
        shape = a.shape + (1,) * (ndim - 1)
        return a.reshape(shape), ca_prev.reshape(shape)

    def theta_post(self, xt: jnp.ndarray, x0: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """q(x_{t-1} | x_t, x0) for one-hot x0 (diffusion_denoising.py:91-103)."""
        a, ca_prev = self._boundary_coeffs(t, xt.ndim)
        theta = (a * xt + (1.0 - a) / self.num_classes) * (ca_prev * x0 + (1.0 - ca_prev) / self.num_classes)
        return theta / jnp.sum(theta, axis=-1, keepdims=True)

    def theta_post_prob(self, xt: jnp.ndarray, theta_x0: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """E_{x0~theta_x0}-mixed posterior, closed form (see module docstring).

        Exactly equals the reference's einsum contraction
        (diffusion_denoising.py:105-139) for any xt (not only one-hot).
        """
        a, ca_prev = self._boundary_coeffs(t, xt.ndim)
        c = self.num_classes
        p = a * xt + (1.0 - a) / c  # theta_{x_t | x_{t-1}}, (B,...,C)
        p_sum = jnp.sum(p, axis=-1, keepdims=True)  # ==1 for one-hot xt; kept general
        denom = ca_prev * p + (1.0 - ca_prev) / c * p_sum
        r = theta_x0 / denom
        return p * (ca_prev * r + (1.0 - ca_prev) / c * jnp.sum(r, axis=-1, keepdims=True))


# ---------------------------------------------------------------------------
# one-hot categorical sampling over the trailing axis
# (reference: ccdm/ddpm/models/one_hot_categorical.py:10-55, channel dim 1)
# ---------------------------------------------------------------------------


def sample_one_hot(key: jax.Array, probs: jnp.ndarray) -> jnp.ndarray:
    """Draw a one-hot sample per position from trailing-axis probs."""
    idx = jax.random.categorical(key, jnp.log(jnp.maximum(probs, 1e-12)), axis=-1)
    return jax.nn.one_hot(idx, probs.shape[-1], dtype=probs.dtype)


def max_prob_one_hot(probs: jnp.ndarray) -> jnp.ndarray:
    """'majority' decode: argmax over classes (one_hot_categorical.py:34-44)."""
    idx = jnp.argmax(probs, axis=-1)
    return jax.nn.one_hot(idx, probs.shape[-1], dtype=probs.dtype)


def brute_force_theta_post_prob(diff: CategoricalDiffusion, xt: np.ndarray, theta_x0: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Reference-shaped O(C^2) contraction, used only by tests to validate
    the closed form against diffusion_denoising.py:105-139 semantics."""
    c = diff.num_classes
    a, ca_prev = diff._boundary_coeffs(jnp.asarray(t), xt.ndim)
    a = np.asarray(a)[..., None]  # (B,1,1... ,1) extra axis for C2
    ca_prev = np.asarray(ca_prev)[..., None]
    eye = np.eye(c).reshape((1,) + (1,) * (xt.ndim - 2) + (c, c))
    p = np.asarray(a[..., 0]) * xt + (1 - np.asarray(a[..., 0])) / c  # (B,...,C1)
    theta_xtm1_x0 = ca_prev * eye + (1 - ca_prev) / c  # (B,...,C1,C2)
    aux = p[..., :, None] * theta_xtm1_x0
    aux = aux / aux.sum(axis=-2, keepdims=True)
    return np.einsum("...cd,...d->...c", aux, theta_x0)
