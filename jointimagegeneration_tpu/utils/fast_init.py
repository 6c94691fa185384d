"""Shape-only parameter materialisation for benchmarks and compile checks.

`flax.linen.Module.init` executes the model forward eagerly to discover
parameter shapes: on a tunneled TPU every one of those hundreds of tiny
op dispatches pays the relay round-trip (~seconds each when the per-op
program cache is cold), so a single model init can cost many MINUTES of
wall clock before any benchmark work starts (BENCH_NOTES round 5).

`shape_init` replaces that with three host-side steps:

  1. `jax.eval_shape` over the init thunk — abstract tracing only, no
     FLOPs, no device dispatch (~6 s for the stage-1 3D UNet);
  2. a numpy fill of the abstract tree (normals at a small scale — for
     timing work the values only need to be finite and well-scaled;
     TPU execution time is value-independent);
  3. ONE `jax.device_put` of the whole tree.

This is a benchmark/dev utility: real training uses `init_params` (the
reference-faithful initialisers) and real serving loads checkpoints.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import numpy as np

__all__ = ["shape_init"]


def shape_init(
    init_thunk: Callable[[jax.Array], object],
    *,
    seed: int = 0,
    scale: float = 0.02,
    device: Optional[jax.Device] = None,
):
    """Materialise `init_thunk(key)`'s parameter tree without running it.

    `init_thunk` takes a PRNG key and returns a parameter pytree (e.g.
    ``lambda k: model.init_params(k, spatial, cond_channels=1)``).  The
    key and all tracing stay on the host CPU backend; the filled tree is
    shipped to `device` (default: the first default-backend device) in a
    single transfer.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        shapes = jax.eval_shape(init_thunk, jax.random.key(seed))
    rng = np.random.default_rng(seed)

    def fill(s):
        arr = rng.standard_normal(s.shape, dtype=np.float32) * scale
        return arr.astype(s.dtype)

    host = jax.tree.map(fill, shapes)
    if device is None:
        device = jax.devices()[0]
    return jax.device_put(host, device)
