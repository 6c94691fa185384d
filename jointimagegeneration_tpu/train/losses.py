"""Training losses for both stages.

Stage 1 (categorical): per-voxel KL(theta_post(x_t,x0) || theta_post_prob
(x_t, x0_pred)) summed over classes, weighted by the true class's weight,
plus unweighted CE on the x0 prediction; both summed and divided by batch
size (ccdm/ddpm/trainer.py:308-327).

Stage 2 (Gaussian): l1/l2 on eps (or x0) with optional logvar scaling and
elbo (lvlb) weighting (ldm/models/diffusion/ddpm.py:1025-1056).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["categorical_diffusion_loss", "gaussian_diffusion_loss", "sample_train_timesteps"]


def sample_train_timesteps(key: jax.Array, batch: int, time_steps: int) -> jnp.ndarray:
    """t ~ p(t) ∝ t^1.5 over [1, T] (trainer.py:298 multinomial(arange^1.5))."""
    logits = 1.5 * jnp.log(jnp.arange(1, time_steps + 1, dtype=jnp.float32))
    return 1 + jax.random.categorical(key, logits, shape=(batch,))


def categorical_diffusion_loss(
    theta_post_true: jnp.ndarray,  # (B, ..., C) posterior with one-hot x0
    theta_post_pred: jnp.ndarray,  # (B, ..., C) posterior with predicted x0-probs
    x0: jnp.ndarray,  # (B, ..., C) one-hot ground truth
    x0_pred_probs: jnp.ndarray,  # (B, ..., C) UNet softmax output
    class_weights: Optional[jnp.ndarray] = None,  # (C,)
) -> Tuple[jnp.ndarray, dict]:
    b = x0.shape[0]
    eps = 1e-12
    log_pred = jnp.log(jnp.maximum(theta_post_pred, eps))
    # pointwise KL, matching torch kl_div(log_pred, true): true*(log true - log_pred)
    kl = theta_post_true * (jnp.log(jnp.maximum(theta_post_true, eps)) - log_pred)
    kl = jnp.sum(kl, axis=-1)  # (B, ...)
    if class_weights is not None:
        w = class_weights[jnp.argmax(x0, axis=-1)]
        kl = kl * w
    ce = -jnp.sum(x0 * jnp.log(jnp.maximum(x0_pred_probs, eps)), axis=-1)
    loss_kl = jnp.sum(kl) / b
    loss_ce = jnp.sum(ce) / b
    loss = loss_kl + loss_ce
    return loss, {"loss": loss, "loss_kl": loss_kl, "loss_ce": loss_ce}


def gaussian_diffusion_loss(
    model_out: jnp.ndarray,
    target: jnp.ndarray,
    t: jnp.ndarray,
    lvlb_weights: jnp.ndarray,
    loss_type: str = "l2",
    logvar: Optional[jnp.ndarray] = None,  # (T,) learned or zeros
    l_simple_weight: float = 1.0,
    elbo_weight: float = 0.0,
) -> Tuple[jnp.ndarray, dict]:
    if loss_type == "l2":
        err = (model_out - target) ** 2
    elif loss_type == "l1":
        err = jnp.abs(model_out - target)
    else:
        raise ValueError(loss_type)
    per_ex = jnp.mean(err, axis=tuple(range(1, err.ndim)))  # (B,)
    loss_simple = per_ex.mean()
    if logvar is not None:
        lv = logvar[t]
        loss_gamma = (per_ex / jnp.exp(lv) + lv).mean()
    else:
        loss_gamma = loss_simple
    loss_vlb = (lvlb_weights[t] * per_ex).mean()
    loss = l_simple_weight * loss_gamma + elbo_weight * loss_vlb
    return loss, {"loss": loss, "loss_simple": loss_simple, "loss_vlb": loss_vlb}
