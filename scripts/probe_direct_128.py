"""DIRECT 128-slice north-star measurement (VERDICT r4 #2).

The single-scan 128-slice program (~77 s device time) crashes the
tunneled TPU worker (BENCH_NOTES round 4), so this measures the full
text→mask→256×256×128 volume wall-clock in FIVE dispatches, each under
the crash threshold:

  1. one mask program: 25-step categorical chain at 64×128×128 →
     nearest-label upsample to (128, 256, 256) → windowed mask channel
  2-5. four 32-slice sample_volume chunks (ddim-50, reference
     semantics: every slice from pure noise, conditioned on [prev
     generated slice, mask slice]); chunk k+1 seeds init_slice with
     chunk k's last slice, exactly the autoregressive contract of
     sample_diffusion.py:208-223.

Per-dispatch overhead (~ms) is real serving overhead and is INCLUDED —
this is the production execution shape, not a lower bound.  Also runs
the dpm-20 route (2 chunks of 64? no — same 4×32 chunking).

Run (TPU, alone):  PYTHONPATH=/root/repo:/root/.axon_site \
    python -u scripts/probe_direct_128.py
"""

import json
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
from jointimagegeneration_tpu.pipeline.two_stage import make_chunked_two_stage_programs

SPATIAL = (64, 128, 128)
D, SIZE = 128, 256
CHUNK = 32


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
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
    cond = jnp.zeros((1, *SPATIAL, 1), jnp.bfloat16)

    def run(name, ddim, **kw):
        # shared program construction (also used by bench.py's direct legs,
        # so the persistent cache covers both)
        mask_program, chunk = make_chunked_two_stage_programs(
            ms, ldm, mask_shape=(1, *SPATIAL), volume_shape=(D, SIZE, SIZE),
            ddim=ddim, chunk=CHUNK, mask_steps=25, cond=cond, **kw)
        # compile both programs + warm the d2h relay OUTSIDE the timed run
        mv = mask_program(ms_params, jax.random.key(2))
        _ = float(jnp.sum(mv))
        v, last = chunk(ldm_params, jax.random.key(3), mv[:, :CHUNK],
                        jnp.zeros((1, SIZE, SIZE, 1)))
        _ = float(jnp.sum(last))

        t0 = time.perf_counter()
        mv = mask_program(ms_params, jax.random.key(10))
        total = jnp.zeros((), jnp.float32)
        init = jnp.zeros((1, SIZE, SIZE, 1))
        for k in range(D // CHUNK):
            v, last = chunk(ldm_params, jax.random.key(20 + k),
                            mv[:, k * CHUNK : (k + 1) * CHUNK], init)
            init = last
            total = total + jnp.sum(v)
        _ = float(total)  # sync
        dt = time.perf_counter() - t0
        emit(metric=name, seconds=round(dt, 3), chunks=D // CHUNK,
             note="direct wall-clock, 5 dispatches, reference semantics")
        return dt

    ddim50 = DDIMParams.create(ldm.diffusion, 50)
    run("e2e_direct_128slice_256x256_chunked_ddim50", ddim50)
    dpm20 = DDIMParams.create(ldm.diffusion, 20, method="uniform_lambda")
    run("e2e_direct_128slice_256x256_chunked_dpm20", dpm20, sampler="dpm")


if __name__ == "__main__":
    main()
