"""VAE+GAN dual-optimizer training (the `_ae` config capability).

Pure-JAX re-derivation of LPIPSWithDiscriminator
(latentdiffusion/ldm/modules/losses/contperceptual.py:49-293):

  generator loss = L1/L2 rec (+ perceptual) / exp(logvar) + kl_weight·KL
                 + d_weight · disc_factor · (−mean D(rec))
                 (+ feature-matching on D activations for the 3D path)
  discriminator  = hinge or vanilla on (D(real), D(fake))
  d_weight       = ||∂nll/∂(last dec layer)|| / ||∂g/∂(last dec layer)||,
                   clipped to [0, 1e4] · disc_weight  (contperceptual.py:83-94)
  disc_factor    = 0 before `disc_start` steps (adopt_weight)

The reference alternates Lightning optimizer_idx per batch
(autoencoder.py:385-429); here one jitted step updates generator and
discriminator sequentially — two optax states, one program, no host
round-trip between the two phases."""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.autoencoder import AutoencoderKL
from ..nn.discriminators import PatchDiscriminator

__all__ = [
    "GANTrainState",
    "make_autoencoder_train_step",
    "make_vq_train_step",
    "hinge_d_loss",
    "vanilla_d_loss",
]


def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (jnp.mean(jax.nn.relu(1.0 - logits_real)) + jnp.mean(jax.nn.relu(1.0 + logits_fake)))


def vanilla_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (jnp.mean(jax.nn.softplus(-logits_real)) + jnp.mean(jax.nn.softplus(logits_fake)))


@struct.dataclass
class GANTrainState:
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    g_tx: optax.GradientTransformation = struct.field(pytree_node=False)
    d_tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, g_params, d_params, g_tx, d_tx):
        return cls(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params, d_params=d_params,
            g_opt=g_tx.init(g_params), d_opt=d_tx.init(d_params),
            g_tx=g_tx, d_tx=d_tx,
        )


_LAST_LAYER = ("params", "decoder", "conv_out", "kernel")


def _get_leaf(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _replace_leaf(tree, path, val):
    if not path:
        return val
    d = dict(tree)
    d[path[0]] = _replace_leaf(tree[path[0]], path[1:], val)
    return d


def _adaptive_d_weight(heads_fn: Callable, g_params, disc_weight: float, last_layer=_LAST_LAYER):
    """d_weight = ||∂nll/∂last_layer|| / ||∂adv/∂last_layer||, clipped to
    [0, 1e4] and scaled (contperceptual.py:83-94).

    The reference differentiates w.r.t. the LAST decoder layer only; doing
    `jax.grad` over the whole generator and picking one leaf costs two full
    backward passes.  Here `heads_fn(kernel) -> (nll, adv)` closes over the
    rest of the params, so one forward + two SHORT pullbacks (loss -> conv_out)
    suffice — reverse-mode stops where the graph stops depending on the leaf."""
    kernel = _get_leaf(g_params, last_layer)
    (nll_v, adv_v), pull = jax.vjp(heads_fn, kernel)
    one = jnp.ones((), nll_v.dtype)
    zero = jnp.zeros((), nll_v.dtype)
    (nll_g,) = pull((one, zero))
    (adv_g,) = pull((zero, one))
    nll_n = jnp.linalg.norm(nll_g.reshape(-1))
    adv_n = jnp.linalg.norm(adv_g.reshape(-1))
    return jax.lax.stop_gradient(jnp.clip(nll_n / (adv_n + 1e-4), 0.0, 1e4) * disc_weight)


def make_autoencoder_train_step(
    model: AutoencoderKL,
    discriminator: PatchDiscriminator,
    kl_weight: float = 1e-6,
    disc_weight: float = 0.5,
    disc_start: int = 50001,
    pixel_loss: str = "l1",
    perceptual_fn: Optional[Callable] = None,
    perceptual_weight: float = 1.0,
    disc_loss: str = "hinge",
    adaptive_d_weight: bool = True,
    feature_matching_weight: float = 0.0,
) -> Callable:
    """feature_matching_weight > 0 adds the GAN feature-matching term of the
    3D path (contperceptual.py:234-250): L1 between discriminator
    activations on real vs reconstructed."""
    d_loss_fn = hinge_d_loss if disc_loss == "hinge" else vanilla_d_loss

    def rec_terms(g_params, key, x):
        rec, posterior = model.apply(g_params, x, key)
        if pixel_loss == "l1":
            rec_err = jnp.abs(x - rec)
        else:
            rec_err = (x - rec) ** 2
        if perceptual_fn is not None:
            rec_err = rec_err + perceptual_weight * perceptual_fn(x, rec)
        nll = jnp.sum(rec_err) / x.shape[0]
        kl = jnp.sum(posterior.kl()) / x.shape[0]
        return rec, nll, kl

    def step(state: GANTrainState, batch: dict, key: jax.Array):
        x = batch["image"]
        k_sample, _ = jax.random.split(key)
        disc_factor = jnp.where(state.step >= disc_start, 1.0, 0.0)

        # ---- generator ----------------------------------------------------
        def g_loss_fn(g_params):
            rec, nll, kl = rec_terms(g_params, k_sample, x)
            if feature_matching_weight > 0:
                logits_fake, feats_fake = discriminator.apply(state.d_params, rec, return_features=True)
                _, feats_real = discriminator.apply(state.d_params, x, return_features=True)
                fm = sum(jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b))) for a, b in zip(feats_fake, feats_real))
                nll = nll + feature_matching_weight * fm
            else:
                logits_fake = discriminator.apply(state.d_params, rec)
            g_adv = -jnp.mean(logits_fake)
            if adaptive_d_weight:
                def heads(kernel):
                    p = _replace_leaf(g_params, _LAST_LAYER, kernel)
                    rec2, nll2, _ = rec_terms(p, k_sample, x)
                    return nll2, -jnp.mean(discriminator.apply(state.d_params, rec2))

                # disc_factor zeroes the adversarial term for the whole
                # warmup (~disc_start steps), so gate the expensive ratio
                # (an extra AE forward + disc forward + two pullbacks) behind
                # a cond instead of paying it every step for a x0 product
                d_weight = jax.lax.cond(
                    state.step >= disc_start,
                    lambda _: _adaptive_d_weight(heads, g_params, disc_weight),
                    lambda _: jnp.zeros((), jnp.float32),
                    operand=None,
                )
            else:
                d_weight = disc_weight
            loss = nll + kl_weight * kl + d_weight * disc_factor * g_adv
            return loss, {"nll": nll, "kl": kl, "g_adv": g_adv, "d_weight": d_weight, "rec": rec}

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params)
        g_updates, g_opt = state.g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        rec = jax.lax.stop_gradient(aux.pop("rec"))

        # ---- discriminator -------------------------------------------------
        def d_loss_closure(d_params):
            logits_real = discriminator.apply(d_params, x)
            logits_fake = discriminator.apply(d_params, rec)
            return disc_factor * d_loss_fn(logits_real, logits_fake)

        d_loss, d_grads = jax.value_and_grad(d_loss_closure)(state.d_params)
        d_updates, d_opt = state.d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        metrics = {"loss": g_loss, "d_loss": d_loss, **{k: v for k, v in aux.items()}}
        new_state = state.replace(
            step=state.step + 1, g_params=g_params, d_params=d_params, g_opt=g_opt, d_opt=d_opt
        )
        return new_state, metrics

    return step


def make_vq_train_step(
    model,  # models.autoencoder.VQModel
    discriminator: PatchDiscriminator,
    codebook_weight: float = 1.0,
    disc_weight: float = 0.5,
    disc_start: int = 50001,
    pixel_loss: str = "l1",
    perceptual_fn: Optional[Callable] = None,
    perceptual_weight: float = 1.0,
    disc_loss: str = "hinge",
) -> Callable:
    """VQGAN dual-optimizer step (the missing-in-reference
    VQLPIPSWithDiscriminator, ldm/modules/losses/vqperceptual.py):
    rec + codebook commit/embed loss + adversarial, with the same
    adaptive last-layer d_weight as the KL path."""
    d_loss_fn = hinge_d_loss if disc_loss == "hinge" else vanilla_d_loss

    def rec_terms(g_params, x):
        rec, qloss, _ = model.apply(g_params, x)
        err = jnp.abs(x - rec) if pixel_loss == "l1" else (x - rec) ** 2
        if perceptual_fn is not None:
            err = err + perceptual_weight * perceptual_fn(x, rec)
        nll = jnp.sum(err) / x.shape[0]
        return rec, nll, qloss

    def step(state: GANTrainState, batch: dict, key: jax.Array):
        x = batch["image"]
        disc_factor = jnp.where(state.step >= disc_start, 1.0, 0.0)

        def g_loss_fn(g_params):
            rec, nll, qloss = rec_terms(g_params, x)
            g_adv = -jnp.mean(discriminator.apply(state.d_params, rec))

            def heads(kernel):
                p = _replace_leaf(g_params, _LAST_LAYER, kernel)
                rec2, nll2, _ = rec_terms(p, x)
                return nll2, -jnp.mean(discriminator.apply(state.d_params, rec2))

            # see make_autoencoder_train_step: skip the ratio while the
            # adversarial term is zeroed by disc_factor
            d_w = jax.lax.cond(
                state.step >= disc_start,
                lambda _: _adaptive_d_weight(heads, g_params, disc_weight),
                lambda _: jnp.zeros((), jnp.float32),
                operand=None,
            )
            loss = nll + codebook_weight * qloss + d_w * disc_factor * g_adv
            return loss, {"nll": nll, "qloss": qloss, "g_adv": g_adv, "d_weight": d_w, "rec": rec}

        (g_loss, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params)
        g_updates, g_opt = state.g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        rec = jax.lax.stop_gradient(aux.pop("rec"))

        def d_loss_closure(d_params):
            return disc_factor * d_loss_fn(
                discriminator.apply(d_params, x), discriminator.apply(d_params, rec)
            )

        d_loss, d_grads = jax.value_and_grad(d_loss_closure)(state.d_params)
        d_updates, d_opt = state.d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        metrics = {"loss": g_loss, "d_loss": d_loss, **aux}
        return state.replace(step=state.step + 1, g_params=g_params, d_params=d_params,
                             g_opt=g_opt, d_opt=d_opt), metrics

    return step
