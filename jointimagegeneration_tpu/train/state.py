"""Train state: params + optimizer + EMA, as one pure pytree.

Replaces both reference EMA mechanisms with pure tree updates inside the
jitted train step:
  * ccdm PolyakAverager (ccdm/ddpm/polyak.py:8-34): fixed
    dst = a*dst + (1-a)*src over the whole state dict;
  * LDM LitEma (ldm/modules/ema.py:5-76): warmup decay
    min(decay, (1+n)/(10+n)) at step n.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

__all__ = ["EMATrainState", "ema_update"]


def ema_update(ema_params, params, decay):
    return jax.tree.map(lambda e, p: e * decay + p * (1.0 - decay), ema_params, params)


@struct.dataclass
class EMATrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any
    nonfinite_count: jnp.ndarray
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_decay: float = struct.field(pytree_node=False, default=0.9999)
    ema_warmup: bool = struct.field(pytree_node=False, default=False)
    # skip-update on non-finite grads (optax.apply_if_finite semantics): the
    # state is NEVER poisoned by a NaN/inf gradient, so the engine's debug
    # dump is always a restorable pre-NaN checkpoint (the reference instead
    # guards every step on the host before stepping, ccdm trainer.py:388-407).
    skip_nonfinite: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(
        cls,
        params,
        tx: optax.GradientTransformation,
        ema_decay: float = 0.9999,
        ema_warmup: bool = False,
        skip_nonfinite: bool = True,
    ):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params),
            nonfinite_count=jnp.zeros((), jnp.int32),
            tx=tx,
            ema_decay=ema_decay,
            ema_warmup=ema_warmup,
            skip_nonfinite=skip_nonfinite,
        )

    def apply_gradients(self, grads, return_finite: bool = False):
        """`return_finite=True` also returns the all-grads-finite scalar this
        update already computes for skip_nonfinite, so train steps can report
        `grad_finite` without a second full-tree isfinite reduction."""
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        if self.ema_warmup:
            # LitEma warmup: decay ramps in as (1+n)/(10+n) (ema.py:33-35)
            n = self.step.astype(jnp.float32) + 1.0
            decay = jnp.minimum(self.ema_decay, (1.0 + n) / (10.0 + n))
        else:
            decay = self.ema_decay
        new_ema = ema_update(self.ema_params, new_params, decay)
        nonfinite = self.nonfinite_count
        finite = None
        if self.skip_nonfinite or return_finite:
            finite = jnp.all(
                jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)])
            )
        if self.skip_nonfinite:
            keep = lambda new, old: jax.tree.map(lambda n, o: jnp.where(finite, n, o), new, old)
            new_params = keep(new_params, self.params)
            new_opt = keep(new_opt, self.opt_state)
            new_ema = keep(new_ema, self.ema_params)
            nonfinite = nonfinite + jnp.where(finite, 0, 1)
        new_state = self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt,
            ema_params=new_ema, nonfinite_count=nonfinite,
        )
        if return_finite:
            return new_state, finite
        return new_state
