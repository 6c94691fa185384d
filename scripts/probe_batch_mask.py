"""Batched-inference ladder for the STAGE-1 mask chain (3D categorical).

The 256² stage-2 ladder found the non-monotonic flip (b=8 wins
1.55x/sample, b=2/4 lose); this asks whether the 3D categorical chain at
the flagship 64×128×128 shape shows the same behaviour — i.e. whether
multi-volume mask sampling should also batch per chip.  Memory makes the
full ladder unlikely to fit (b=8 forward activations ≈ 8× b=1), so the
chain is short (10 steps) and failures are tolerated per rung.

Run (TPU, one process at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_batch_mask.py [b1 b2 ...]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

if jax.default_backend() != "cpu":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from jointimagegeneration_tpu.models import MaskSampler

SPATIAL = (64, 128, 128)
STEPS = 10
LADDER = tuple(int(a) for a in sys.argv[1:]) or (1, 2, 4, 8)


def main():
    model = MaskSampler.create(
        num_classes=12, time_steps=1000, model_channels=64,
        channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
        num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.key(0), SPATIAL, cond_channels=1)
    results = {}
    for b in LADDER:
        cond = jnp.zeros((b, *SPATIAL, 1), jnp.bfloat16)

        @jax.jit
        def run(params, key, cond=cond, b=b):
            x = model.sample(params, key, (b, *SPATIAL), cond=cond, num_steps=STEPS)
            return jnp.sum(x[..., 0])

        try:
            _ = float(run(params, jax.random.key(2)))
            n = 3
            t0 = time.perf_counter()
            for i in range(n):
                _ = float(run(params, jax.random.key(3 + i)))
            dt = (time.perf_counter() - t0) / n
            per = dt / (b * STEPS)
            results[b] = per
            print(f"[mask@64x128x128 b={b}] chain {dt:.3f} s  "
                  f"{per * 1e3:.2f} ms/sample/step  ({b * STEPS / dt:.1f} sample-steps/s)"
                  + (f"  vs b=1: {results[1] / per:.2f}x" if 1 in results else ""),
                  flush=True)
        except Exception as e:
            print(f"[mask@64x128x128 b={b}] FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
