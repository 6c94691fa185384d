"""On-chip e2e measurement of the COMPOSED dpm-20 + warm_start route (round 3).

Round-3 measured the two speed knobs separately (BENCH_NOTES):
  * dpm-20/uniform-lambda: 0.230 s/slice (reference semantics kept)
  * warm_start 0.4 on ddim-50: 0.232 s/slice (truncated-chain semantics)
After composing them (solver runs only its last round(f*S) nodes from the
q-noised previous slice) the predicted per-slice rate is ~f * 0.230.
This probe measures the real compound at 16 and 32 slices and fits the
128-slice figure, plus the same with f=0.2 (8 solver nodes/slice).

Run (TPU, one process at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_dpm_warm.py
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
    ddim = DDIMParams.create(ldm.diffusion, 20, method="uniform_lambda")

    def make_run(nz, warm):
        @jax.jit
        def run(ms_params, ldm_params, key):
            ct, labels = pipe(
                ms_params, ldm_params, key,
                mask_shape=(1, *SPATIAL), volume_shape=(nz, SIZE, SIZE),
                ddim=ddim, mask_steps=25,
                cond=jnp.zeros((1, *SPATIAL, 1), jnp.bfloat16),
                sampler="dpm", warm_start=warm,
            )
            return jnp.sum(ct) + jnp.sum(labels)

        return run

    legs = [(16, 0.4), (32, 0.4), (16, 0.2), (32, 0.2)]
    results = {}
    for nz, warm in legs:
        run = make_run(nz, warm)
        t0 = time.perf_counter()
        _ = float(run(ms_params, ldm_params, jax.random.key(3)))
        print(f"[compile+run] nz={nz} dpm-20 warm={warm}: "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        _ = float(run(ms_params, ldm_params, jax.random.key(4)))
        dt = time.perf_counter() - t0
        results[(nz, warm)] = dt
        print(f"e2e nz={nz} dpm-20 warm={warm}: {dt:.2f}s", flush=True)

    for warm in (0.4, 0.2):
        if (16, warm) in results and (32, warm) in results:
            rate = (results[(32, warm)] - results[(16, warm)]) / 16.0
            base = results[(16, warm)] - 16 * rate
            print(f"dpm-20 warm={warm} fit: base {base:.2f}s, rate {rate:.3f}s/slice, "
                  f"extrapolated 128-slice: {base + 128 * rate:.1f}s", flush=True)


if __name__ == "__main__":
    main()
