"""Stage 1 — categorical-diffusion volumetric mask sampler.

TPU-native equivalent of ccdm's DenoisingModel + evaluator drive loop
(ccdm/ddpm/models/diffusion_denoising.py:142-227, ccdm/ddpm/evaluator.py:128-170):
a 3D UNet predicts x0 class probabilities and the sampler walks the
categorical posterior from t=T to t=1.

The whole reverse loop is ONE `lax.scan` program: schedule tensors are
scan constants, the per-step categorical posterior is the O(C)
closed form (diffusion/categorical.py), and PRNG keys are threaded
through the carry — so a full 250-step volume sample is a single XLA
executable with no per-step host dispatch (the reference re-dispatches
the UNet from Python each step).

Step-subsetting mirrors the reference's `init_t > 10000` encoding of
"use K steps" (diffusion_denoising.py:190-197): K steps are taken at
round(linspace(T, 1, K)).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.categorical import (
    CategoricalDiffusion,
    max_prob_one_hot,
    sample_one_hot,
)
from ..nn.text import TextFeatureRefiner
from ..nn.unet import UNet
from .common import unet_vars

__all__ = ["MaskSampler", "unet_vars"]


def sampling_t_values(time_steps: int, num_steps: Optional[int] = None) -> np.ndarray:
    """Descending t values in [1, T]; K-step subset via rounded linspace."""
    if num_steps is None or num_steps == time_steps:
        return np.arange(time_steps, 0, -1, dtype=np.int32)
    assert 0 < num_steps <= time_steps
    return np.round(np.linspace(time_steps, 1, num_steps)).astype(np.int32)


@dataclass(frozen=True)
class MaskSampler:
    """UNet + categorical process + scan sampler.  Pure/functional: params
    are passed explicitly to every method."""

    unet: UNet
    diffusion: CategoricalDiffusion
    num_classes: int
    step_T_sample: str = "majority"  # 'majority' (argmax) | 'confidence' (sample)
    # trainable text-feature refiner (PreloadedBERTEncoder equivalent); its
    # params live under params['refiner'] and train/EMA with the UNet:
    refiner: Optional[TextFeatureRefiner] = None

    @classmethod
    def create(
        cls,
        num_classes: int = 12,
        img_channels: int = 1,
        time_steps: int = 1000,
        schedule: str = "cosine",
        model_channels: int = 64,
        channel_mult: Sequence[int] = (1, 2, 2, 4, 5),
        attention_resolutions: Sequence[int] = (32, 16, 8),
        num_res_blocks: int = 2,
        num_head_channels: int = 32,
        context_dim: Optional[int] = None,
        dims: int = 3,
        dtype=jnp.float32,
        step_T_sample: str = "majority",
        remat: bool = False,
        remat_levels: Optional[Sequence[int]] = None,
        remat_policy: Optional[str] = None,
        spatial_axis: Optional[str] = None,
        text_refiner: Optional[dict] = None,
        use_fused_resblock: object = False,
        **schedule_params,
    ) -> "MaskSampler":
        """Mirror of ccdm's build_model (models/builder.py:14-53):
        UNet input = one-hot classes + condition-image channels."""
        unet = UNet(
            model_channels=model_channels,
            out_channels=num_classes,
            num_res_blocks=num_res_blocks,
            attention_resolutions=tuple(attention_resolutions),
            channel_mult=tuple(channel_mult),
            dims=dims,
            num_head_channels=num_head_channels,
            softmax_output=True,
            context_dim=context_dim,
            dtype=dtype,
            remat=remat,
            remat_levels=None if remat_levels is None else tuple(remat_levels),
            remat_policy=remat_policy,
            spatial_axis=spatial_axis,
            use_fused_resblock=use_fused_resblock,
        )
        diffusion = CategoricalDiffusion.create(schedule, time_steps, num_classes, **schedule_params)
        refiner = None
        if text_refiner is not None:
            refiner = TextFeatureRefiner(
                embed_dim=text_refiner.get("embed_dim", context_dim or 768),
                n_heads=text_refiner.get("n_heads", 8),
                depth=text_refiner.get("model_depth", 4),
                d_head=text_refiner.get("d_head", 64),
                dropout=text_refiner.get("dropout", 0.2),
            )
        return cls(
            unet=unet, diffusion=diffusion, num_classes=num_classes,
            step_T_sample=step_T_sample, refiner=refiner,
        )

    # -- init ----------------------------------------------------------------

    def init_params(
        self, key: jax.Array, spatial: Sequence[int], cond_channels: int = 1,
        context_shape=None, feature_cond_shapes: Optional[dict] = None,
    ):
        """`feature_cond_shapes` = {inject_idx: (*spatial_at_site, F)}
        materialises the UNet's feature-concat sites at init so dense
        extractor conditioning (e.g. DINO) has parameters to train
        against (unet.py:485-507)."""
        x = jnp.zeros((1, *spatial, self.num_classes))
        cond = jnp.zeros((1, *spatial, cond_channels)) if cond_channels else None
        if context_shape is None and self.refiner is not None:
            context_shape = (4, self.refiner.embed_dim)
        ctx = None if context_shape is None else jnp.zeros((1, *context_shape))
        fc = None
        if feature_cond_shapes is not None:
            fc = {i: jnp.zeros((1, *s)) for i, s in feature_cond_shapes.items()}
        t = jnp.zeros((1,))
        uv = self.unet.init(key, x, t, cond=cond, context=ctx, feature_cond=fc)
        if self.refiner is None:
            return uv
        kr = jax.random.fold_in(key, 1)
        return {"unet": uv, "refiner": self.refiner.init(kr, ctx)}

    # -- trainable context refinement -----------------------------------------

    def refine_context(self, params, context, *, rng: Optional[jax.Array] = None):
        """Apply the trainable text refiner (trainer.py:287 `context =
        feature_cond_encoder(context)`); dropout active when `rng` given."""
        if self.refiner is None or context is None:
            return context
        rv = params["refiner"]
        if rng is None:
            return self.refiner.apply(rv, context)
        return self.refiner.apply(rv, context, deterministic=False, rngs={"dropout": rng})

    # -- one denoise step (the benchmarked unit) ------------------------------

    def denoise_step(self, params, key, xt, t, cond=None, context=None, feature_cond=None, guidance_fn=None):
        """UNet x0-probs -> categorical posterior -> next x_{t-1} one-hot.

        `t` is a (B,)-int array in [1, T].  At t==1 the decode rule applies
        ('majority' argmax / 'confidence' sample), matching
        diffusion_denoising.py:218-224.  `guidance_fn(probs) -> gradients`
        implements the reference's label-reference gradient guidance
        (probs <- probs - gradients, diffusion_denoising.py:211-214)."""
        context = self.refine_context(params, context)
        x0pred = self.unet.apply(
            unet_vars(params), xt, t.astype(jnp.float32),
            cond=cond, context=context, feature_cond=feature_cond,
        )
        probs = self.diffusion.theta_post_prob(xt, x0pred, t)
        if guidance_fn is not None:
            probs = probs - guidance_fn(probs)
        probs = jnp.maximum(probs, 1e-12)
        sampled = sample_one_hot(key, probs)
        if self.step_T_sample == "confidence":
            decoded = sampled
        else:
            decoded = max_prob_one_hot(probs)
        is_last = (t <= 1).reshape((-1,) + (1,) * (xt.ndim - 1))
        return jnp.where(is_last, decoded, sampled)

    # -- full reverse chain, scan-compiled ------------------------------------

    def sample(
        self,
        params,
        key: jax.Array,
        shape: Sequence[int],
        cond: Optional[jnp.ndarray] = None,
        context: Optional[jnp.ndarray] = None,
        feature_cond: Optional[dict] = None,
        num_steps: Optional[int] = None,
        x_init: Optional[jnp.ndarray] = None,
        guidance_fn=None,
    ) -> jnp.ndarray:
        """Sample a (B, D, H, W, C) one-hot mask volume.

        Starts from a uniform categorical draw (evaluator.py:136) unless
        `x_init` is given.  Returns the one-hot decode at t=1.

        `x_init` is consumed as LABELS: the scan carries integer labels, so
        a non-one-hot (soft) x_init is collapsed via argmax before the first
        denoise step rather than fed to the posterior as probabilities —
        pass a one-hot draw (as the reference's evaluator does) for exact
        reference semantics.
        """
        b = shape[0]
        t_values = jnp.asarray(sampling_t_values(self.diffusion.time_steps, num_steps))
        if x_init is None:
            key, sub = jax.random.split(key)
            x_init = sample_one_hot(sub, jnp.full((*shape, self.num_classes), 1.0 / self.num_classes))

        # The scan carries integer labels (4 B/voxel) instead of the f32
        # one-hot (48 B/voxel) and re-one-hots inside the body — bit-identical
        # because denoise_step always emits exact one-hots (sampled draw or
        # argmax decode), and measured +1.4% on the flagship chain by cutting
        # the while-loop carry traffic (BENCH_NOTES round 3, carry probe).
        def body(carry, t):
            lab, k = carry
            k, sub = jax.random.split(k)
            xt = jax.nn.one_hot(lab, self.num_classes, dtype=jnp.float32)
            t_b = jnp.full((b,), t, jnp.int32)
            xt = self.denoise_step(
                params, sub, xt, t_b, cond=cond, context=context,
                feature_cond=feature_cond, guidance_fn=guidance_fn,
            )
            return (jnp.argmax(xt, axis=-1).astype(jnp.int32), k), None

        lab0 = jnp.argmax(x_init, axis=-1).astype(jnp.int32)
        (lab, _), _ = jax.lax.scan(body, (lab0, key), t_values)
        return jax.nn.one_hot(lab, self.num_classes, dtype=x_init.dtype)

    def sample_labels(self, params, key, shape, **kw) -> jnp.ndarray:
        """Integer label volume (B, D, H, W) — the stage-1→2 contract."""
        return jnp.argmax(self.sample(params, key, shape, **kw), axis=-1)
