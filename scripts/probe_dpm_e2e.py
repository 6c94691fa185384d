"""On-chip e2e A/B of the DPM-Solver++(2M) route (round 3).

Full two-stage pipeline (25-step mask at 64x128x128 -> N slices of 256^2)
with the reference chain (ddim-50/uniform) vs dpm-20 and dpm-10 on
uniform-lambda nodes.  Each DPM step is exactly one UNet call (the 2M
correction is arithmetic on saved predictions), so per-slice cost should
scale as steps/50; this probe measures how much shows up end to end.

Run (TPU, one process at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_dpm_e2e.py
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
SIZE = 256


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
    return ms, ms_params, ldm, ldm_params


def main():
    ms, ms_params, ldm, ldm_params = build()
    pipe = TwoStagePipeline(ms, ldm)

    def make_run(nz, sampler, steps, disc):
        ddim = DDIMParams.create(ldm.diffusion, steps, method=disc)

        @jax.jit
        def run(ms_params, ldm_params, key):
            ct, labels = pipe(
                ms_params, ldm_params, key,
                mask_shape=(1, *SPATIAL), volume_shape=(nz, SIZE, SIZE),
                ddim=ddim, mask_steps=25,
                cond=jnp.zeros((1, *SPATIAL, 1), jnp.bfloat16),
                sampler=sampler,
            )
            return jnp.sum(ct) + jnp.sum(labels)

        return run

    legs = [
        (16, "ddim", 50, "uniform"),
        (16, "dpm", 20, "uniform_lambda"),
        (16, "dpm", 10, "uniform_lambda"),
        (32, "dpm", 20, "uniform_lambda"),
    ]
    results = {}
    for nz, sampler, steps, disc in legs:
        run = make_run(nz, sampler, steps, disc)
        t0 = time.perf_counter()
        _ = float(run(ms_params, ldm_params, jax.random.key(3)))
        print(f"[compile+run] nz={nz} {sampler}-{steps}/{disc}: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        _ = float(run(ms_params, ldm_params, jax.random.key(4)))
        dt = time.perf_counter() - t0
        results[(nz, sampler, steps)] = dt
        print(f"e2e nz={nz} {sampler}-{steps}/{disc}: {dt:.2f}s", flush=True)

    if (16, "dpm", 20) in results and (32, "dpm", 20) in results:
        rate = (results[(32, "dpm", 20)] - results[(16, "dpm", 20)]) / 16.0
        base = results[(16, "dpm", 20)] - 16 * rate
        print(f"dpm-20 fit: base {base:.2f}s, rate {rate:.3f}s/slice, "
              f"extrapolated 128-slice: {base + 128 * rate:.1f}s", flush=True)
    if (16, "ddim", 50) in results and (16, "dpm", 20) in results:
        print(f"16-slice speedup dpm-20 vs ddim-50: "
              f"{results[(16, 'ddim', 50)] / results[(16, 'dpm', 20)]:.2f}x", flush=True)


if __name__ == "__main__":
    main()
