"""Jittable train steps for both stages.

Each factory closes over the model and returns a pure
`step(state, batch, key) -> (state, metrics)` suitable for `jax.jit` (or
pjit over a mesh — gradients sync via the sharding of `batch`, there is
no DDP wrapper; SURVEY.md §2.3).

Non-finite-loss guarding mirrors the reference's invariant check
(trainer.py:388-407) the XLA way: `optax.apply_if_finite`-style masking
is replaced by a metrics flag the host can act on, because branching on
loss values inside jit would force a sync.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..models.mask_sampler import MaskSampler, unet_vars
from ..models.slice_ldm import SliceLDM
from .losses import categorical_diffusion_loss, gaussian_diffusion_loss, sample_train_timesteps
from .state import EMATrainState

__all__ = ["make_mask_train_step", "make_ldm_train_step", "make_latent_ldm_train_step"]


def make_mask_train_step(
    model: MaskSampler,
    class_weights: Optional[jnp.ndarray] = None,
    feature_inject_idx: Optional[int] = None,
) -> Callable:
    """Stage-1 step (trainer.py:271-339): t ~ t^1.5, x_t ~ q(x_t|x0),
    UNet x0-probs, KL+CE loss, EMA update.

    `feature_inject_idx` routes a per-batch dense extractor feature map
    (batch['feature_cond'], e.g. frozen-DINO keys precomputed once per
    batch rather than per diffusion step) into the UNet's feature-concat
    site at that encoder block (unet.py:785-803)."""

    diff = model.diffusion

    def loss_fn(params, key, x0, cond, context, feature):
        b = x0.shape[0]
        kt, kx, kd = jax.random.split(key, 3)
        t = sample_train_timesteps(kt, b, diff.time_steps)
        xt = diff.sample_q_xt_given_x0(kx, x0, t)
        # trainable text refiner applied INSIDE the loss so its params get
        # gradients and EMA alongside the UNet (trainer.py:287, 850-852)
        context = model.refine_context(params, context, rng=kd)
        fc = None if feature is None else {feature_inject_idx: feature}
        x0pred = model.unet.apply(
            unet_vars(params), xt, t.astype(jnp.float32),
            cond=cond, context=context, feature_cond=fc,
        )
        post_true = diff.theta_post(xt, x0, t)
        post_pred = diff.theta_post_prob(xt, x0pred, t)
        return categorical_diffusion_loss(post_true, post_pred, x0, x0pred, class_weights)

    def step(state: EMATrainState, batch: dict, key: jax.Array):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, key, batch["mask"], batch.get("image"), batch.get("context"),
            batch.get("feature_cond") if feature_inject_idx is not None else None,
        )
        state, finite = state.apply_gradients(grads, return_finite=True)
        metrics["grad_finite"] = finite
        return state, metrics

    return step


def make_ldm_train_step(
    model: SliceLDM,
    loss_type: str = "l2",
    l_simple_weight: float = 1.0,
    elbo_weight: float = 0.0,
) -> Callable:
    """Stage-2 step (ddpm.py:1025-1056 via shared_step): t ~ U[0,T),
    eps-MSE with lvlb bookkeeping, LitEma-style warmup EMA in the state.

    When the state's params carry a 'logvar' leaf (init_params(...,
    learn_logvar=True)), the loss divides by exp(logvar[t]) and the
    parameter trains with the UNet (ddpm.py:111-115, 1040-1049, 423)."""

    diff = model.diffusion

    def loss_fn(params, key, x0, cond, context, y):
        b = x0.shape[0]
        kt, kn = jax.random.split(key)
        t = jax.random.randint(kt, (b,), 0, diff.num_timesteps)
        noise = jax.random.normal(kn, x0.shape, x0.dtype)
        x_noisy = diff.q_sample(x0, t, noise)
        model_out = model.apply_model(params, x_noisy, t, cond=cond, context=context, y=y)
        target = noise if diff.parameterization == "eps" else x0
        logvar = params.get("logvar") if isinstance(params, dict) and "logvar" in params else None
        return gaussian_diffusion_loss(
            model_out, target, t, diff.lvlb_weights, loss_type,
            logvar=logvar, l_simple_weight=l_simple_weight, elbo_weight=elbo_weight,
        )

    def step(state: EMATrainState, batch: dict, key: jax.Array):
        # class ids for 'adm' mode under either reference key
        # (cond_stage_key 'class_label', ddpm.py:1428)
        y = batch.get("y", batch.get("class_label"))
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, key, batch["image"], batch.get("cond"), batch.get("context"), y
        )
        state, finite = state.apply_gradients(grads, return_finite=True)
        metrics["grad_finite"] = finite
        return state, metrics

    return step


def make_latent_ldm_train_step(
    latent_model,
    ae_params,
    cond_ae_params=None,
    **ldm_step_kwargs,
) -> Callable:
    """Latent (`_ae`) stage-2 step: the pixel batch is pushed through the
    FROZEN first/cond stages inside the jitted step (get_input →
    encode_first_stage + get_learned_conditioning, ddpm.py:662-741), then
    the pixel-space step logic runs unchanged on latents.

    The AE params are closure constants — they take no gradients and are
    not part of the train state (the reference freezes its first stage the
    same way, ddpm.py:510-516 `train=False` + requires_grad off).
    `latent_model` must already carry the calibrated `scale_factor`
    (scale_by_std happens once at CLI assembly, not per step)."""
    from ..models.latent_ldm import LatentSliceLDM

    assert isinstance(latent_model, LatentSliceLDM)
    inner_step = make_ldm_train_step(latent_model.inner, **ldm_step_kwargs)

    def step(state: EMATrainState, batch: dict, key: jax.Array):
        ke, kl = jax.random.split(key)
        z0, cond_z = latent_model.train_loss_inputs(
            ae_params, ke, batch["image"], batch.get("cond"),
            cond_ae_params=cond_ae_params,
        )
        latent_batch = {**batch, "image": z0}
        if cond_z is not None:
            latent_batch["cond"] = cond_z
        return inner_step(state, latent_batch, kl)

    return step
