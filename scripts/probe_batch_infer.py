"""Batched-INFERENCE ladder at 256² on the real chip.

Round-3 CFG probe measured only b=2 (1.69x per-sample loss) and the
batched-training ladder (probe_batch_train.py) showed the b-dependence is
NON-monotonic: per-sample train cost rises at b=2/4 but drops to 0.42x at
b=8 (the batch dim fills the 8-sublane tile dimension exactly). This
probe completes the picture for the sampling path — the 50-step DDIM
slice chain (one scan program, exactly how serving runs) at
b ∈ {1, 2, 4, 8, 16} volumes, per-sample-per-step cost.

If b=8 shows the same flip, single-chip multi-volume serving
(`batch: 8`) delivers >2x aggregate throughput with unchanged semantics.

Run (TPU, one process at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_batch_infer.py [size] [b1 b2 ...]

Measured (round-3 continuation, v5e-1): 256² b=8 WINS 1.55x/sample
(7.97 ms vs 12.36 ms; b=16 plateaus at 7.91), b=2/4 lose 0.60-0.67x —
the same tile-shaped flip as the train ladder.
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

from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
from jointimagegeneration_tpu.models import SliceLDM

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 256
LADDER = tuple(int(a) for a in sys.argv[2:]) or (1, 2, 4, 8, 16)
STEPS = 50


def main():
    model = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=1000,
        model_channels=128, channel_mult=(1, 2, 4, 4, 5),
        attention_resolutions=(32, 16, 8), num_res_blocks=2,
        num_head_channels=32, dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.key(1), SIZE)
    ddim = DDIMParams.create(model.diffusion, STEPS)
    results = {}
    for b in LADDER:
        cond = jnp.zeros((b, SIZE, SIZE, 2), jnp.bfloat16)

        @jax.jit
        def run(params, key, cond=cond):
            s = model.sample_slice(params, key, cond, ddim)
            return jnp.sum(s)

        try:
            _ = float(run(params, jax.random.key(2)))
            n = 3
            t0 = time.perf_counter()
            for i in range(n):
                _ = float(run(params, jax.random.key(3 + i)))
            dt = (time.perf_counter() - t0) / n
            per_sample_step = dt / (b * STEPS)
            results[b] = per_sample_step
            print(f"[infer@{SIZE} b={b:2d}] chain {dt:.3f} s  "
                  f"{per_sample_step * 1e3:.2f} ms/sample/step  "
                  f"({b * STEPS / dt:.1f} sample-steps/s)"
                  + (f"  vs b=1: {results[1] / per_sample_step:.2f}x" if 1 in results else ""),
                  flush=True)
        except Exception as e:
            print(f"[infer@{SIZE} b={b}] FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
