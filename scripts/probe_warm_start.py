"""On-chip A/B of the warm-start autoregressive option (round 3).

Measures the full two-stage pipeline (25-step mask at 64x128x128 ->
16/32 slices of 256^2 at 50 DDIM steps — bench.py's e2e legs) with
`warm_start` off vs 0.4 vs 0.2.  Warm start runs only the last
round(f*50) DDIM steps per slice after the first, initialised from the
previous slice's raw sample noised to that level (SDEdit truncation) —
per-slice cost should approach f of the full chain; this probe measures
how much of that shows up end to end.

Run (TPU, one process at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_warm_start.py
"""

import os
import time

import jax
import jax.numpy as jnp

if jax.default_backend() != "cpu":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
from jointimagegeneration_tpu.models import MaskSampler, SliceLDM
from jointimagegeneration_tpu.pipeline import TwoStagePipeline

SPATIAL = (64, 128, 128)
SIZE, DDIM_STEPS = 256, 50


def build():
    ms = MaskSampler.create(
        num_classes=12, time_steps=1000, model_channels=64,
        channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
        num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16,
    )
    ms_params = ms.init_params(jax.random.key(0), SPATIAL, cond_channels=1)
    ldm = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=1000,
        model_channels=128, channel_mult=(1, 2, 4, 4, 5),
        attention_resolutions=(32, 16, 8), num_res_blocks=2,
        num_head_channels=32, dtype=jnp.bfloat16,
    )
    ldm_params = ldm.init_params(jax.random.key(1), SIZE)
    ddim = DDIMParams.create(ldm.diffusion, DDIM_STEPS)
    return ms, ms_params, ldm, ldm_params, ddim


def main():
    ms, ms_params, ldm, ldm_params, ddim = build()
    pipe = TwoStagePipeline(ms, ldm)

    def make_run(nz, warm):
        @jax.jit
        def run(ms_params, ldm_params, key):
            ct, labels = pipe(
                ms_params, ldm_params, key,
                mask_shape=(1, *SPATIAL), volume_shape=(nz, SIZE, SIZE),
                ddim=ddim, mask_steps=25,
                cond=jnp.zeros((1, *SPATIAL, 1), jnp.bfloat16),
                warm_start=warm,
            )
            return jnp.sum(ct) + jnp.sum(labels)

        return run

    results = {}
    for nz, warm in [(16, None), (16, 0.4), (16, 0.2), (32, 0.4)]:
        run = make_run(nz, warm)
        t0 = time.perf_counter()
        _ = float(run(ms_params, ldm_params, jax.random.key(3)))
        print(f"[compile+run] nz={nz} warm={warm}: {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        _ = float(run(ms_params, ldm_params, jax.random.key(4)))
        dt = time.perf_counter() - t0
        results[(nz, warm)] = dt
        print(f"e2e nz={nz} warm={warm}: {dt:.2f}s", flush=True)

    # affine fit of the warm per-slice rate from the 16/32 @ 0.4 pair
    if (16, 0.4) in results and (32, 0.4) in results:
        rate = (results[(32, 0.4)] - results[(16, 0.4)]) / 16.0
        base = results[(16, 0.4)] - 16 * rate
        print(f"warm=0.4 fit: base {base:.2f}s, rate {rate:.3f}s/slice, "
              f"extrapolated 128-slice: {base + 128 * rate:.1f}s", flush=True)
    if (16, None) in results and (16, 0.4) in results:
        print(f"16-slice speedup warm=0.4: "
              f"{results[(16, None)] / results[(16, 0.4)]:.2f}x", flush=True)


if __name__ == "__main__":
    main()
