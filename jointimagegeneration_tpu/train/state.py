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
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_decay: float = struct.field(pytree_node=False, default=0.9999)
    ema_warmup: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, ema_decay: float = 0.9999, ema_warmup: bool = False):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params),
            tx=tx,
            ema_decay=ema_decay,
            ema_warmup=ema_warmup,
        )

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        if self.ema_warmup:
            # LitEma warmup: decay ramps in as (1+n)/(10+n) (ema.py:33-35)
            n = self.step.astype(jnp.float32) + 1.0
            decay = jnp.minimum(self.ema_decay, (1.0 + n) / (10.0 + n))
        else:
            decay = self.ema_decay
        new_ema = ema_update(self.ema_params, new_params, decay)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt, ema_params=new_ema)
