"""PLMS (pseudo linear multistep) sampler.

Re-derivation of ldm/models/diffusion/plms.py:11-236 as a pure scan
step.  The reference keeps a Python list of the last 3 eps predictions
and branches on its length; here the multistep history is a fixed
(3, *x.shape) buffer in the scan carry and the Adams-Bashforth order is
selected with `lax.switch` on the step counter — same numerics, one
compiled program.

Order selection (plms.py:180-196):
  step 0: Heun half-step — x' from e_t, then e' = eps(x', t_prev),
          e_prime = (e_t + e')/2
  step 1: (3 e_t − e_{t−1}) / 2
  step 2: (23 e_t − 16 e_{t−1} + 5 e_{t−2}) / 12
  step ≥3: (55 e_t − 59 e_{t−1} + 37 e_{t−2} − 9 e_{t−3}) / 24
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .ddim import DDIMParams

__all__ = ["plms_sample_loop"]


def _x_prev(params: DDIMParams, x, e, index):
    shape = (1,) * x.ndim
    a_t = params.alphas[index].reshape(shape)
    a_prev = params.alphas_prev[index].reshape(shape)
    sqrt_om = params.sqrt_one_minus_alphas[index].reshape(shape)
    pred_x0 = (x - sqrt_om * e) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(1.0 - a_prev) * e
    return jnp.sqrt(a_prev) * pred_x0 + dir_xt, pred_x0


def plms_sample_loop(
    eps_fn: Callable,  # (x, t_batch) -> eps
    params: DDIMParams,
    x_T: jnp.ndarray,
    start_index: int | None = None,
) -> jnp.ndarray:
    """Run the PLMS chain from x_T; returns x_0 estimate.

    `start_index=k` (static, 1 ≤ k ≤ num_steps) runs only the LAST k
    nodes (subset indices k-1 … 0); the caller must supply x_T already at
    node k-1's noise level (same warm-start contract as
    SliceLDM.sample_slice's start_index).  The Adams-Bashforth order
    ramps 1→4 from the first EXECUTED step, exactly like a full chain."""
    b = x_T.shape[0]
    n = params.num_steps
    k_run = n if start_index is None else int(start_index)
    if not 1 <= k_run <= n:
        raise ValueError(f"start_index must be in [1, {n}], got {start_index}")
    i0 = n - k_run

    def eps_at(x, index):
        t = jnp.full((b,), params.timesteps[index], jnp.int32)
        return eps_fn(x, t)

    def body(carry, i):
        x, hist = carry  # hist: (3, *x.shape), hist[0] most recent
        index = n - 1 - i
        e_t = eps_at(x, index)
        index_prev = jnp.maximum(index - 1, 0)

        def order1(_):
            # Heun: provisional x', second eval at t_prev
            x1, _ = _x_prev(params, x, e_t, index)
            e_next = eps_at(x1, index_prev)
            return (e_t + e_next) / 2

        def order2(_):
            return (3 * e_t - hist[0]) / 2

        def order3(_):
            return (23 * e_t - 16 * hist[0] + 5 * hist[1]) / 12

        def order4(_):
            return (55 * e_t - 59 * hist[0] + 37 * hist[1] - 9 * hist[2]) / 24

        e_prime = jax.lax.switch(jnp.minimum(i - i0, 3),
                                 [order1, order2, order3, order4], None)
        x_new, _ = _x_prev(params, x, e_prime, index)
        hist = jnp.concatenate([e_t[None], hist[:2]], axis=0)
        return (x_new, hist), None

    hist0 = jnp.zeros((3,) + x_T.shape, x_T.dtype)
    (x, _), _ = jax.lax.scan(body, (x_T, hist0), i0 + jnp.arange(k_run))
    return x
