"""Streaming time-to-first-slice (TTFS) on the real chip.

The serving story (cli/serve.py `stream: true`) delivers CT slices as the
autoregressive z-loop produces them; for interactive consumers the
latency that matters is time to the FIRST slice, not the full volume.
This probe measures TTFS and inter-slice cadence of
`SliceLDM.stream_volume` at the production shape (mask 64x128x128 ->
16x256^2 CT) for the three sampling routes:

  * ddim-50 / uniform-t      (reference semantics)
  * dpm-20 / uniform-lambda  (fast preset, reference per-slice semantics)
  * dpm-20 + warm_start 0.4  (composed; slices 1+ run 8 solver nodes)

Note streaming runs per-slice jitted programs (cached on the instance)
rather than one whole-volume scan, so cadence also shows the per-slice
dispatch overhead the scan route avoids — measuring it here makes the
trade explicit.

Run (TPU, one process at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_stream_ttfs.py
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
from jointimagegeneration_tpu.pipeline.two_stage import normalize_mask_channel, upsample_labels

SPATIAL = (64, 128, 128)
SIZE, N_SLICES = 256, 16


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


def measure(name, ldm, ldm_params, mask_channel, ddim, warm=None, sampler="ddim"):
    # warm the per-slice programs (compile outside the timed pass)
    for i, s in enumerate(ldm.stream_volume(
            ldm_params, jax.random.key(7), mask_channel, ddim,
            warm_start=warm, sampler=sampler)):
        _ = float(jnp.sum(s))
        if i >= 1:
            break
    t0 = time.perf_counter()
    times = []
    for s in ldm.stream_volume(ldm_params, jax.random.key(8), mask_channel, ddim,
                               warm_start=warm, sampler=sampler):
        _ = float(jnp.sum(s))  # sync: the consumer has the slice NOW
        times.append(time.perf_counter() - t0)
    ttfs = times[0]
    cadence = (times[-1] - times[0]) / max(len(times) - 1, 1)
    print(f"[{name}] TTFS(slice0)={ttfs:.2f}s cadence={cadence:.3f}s/slice "
          f"total({len(times)})={times[-1]:.2f}s", flush=True)
    return ttfs, cadence


def main():
    ms, ms_params, ldm, ldm_params = build()

    # stage-1 mask once (shared by all routes; the serve path does the same)
    @jax.jit
    def mask_fn(params, key):
        return ms.sample_labels(params, key, (1, *SPATIAL),
                                cond=jnp.zeros((1, *SPATIAL, 1), jnp.bfloat16),
                                num_steps=25)

    t0 = time.perf_counter()
    labels = mask_fn(ms_params, jax.random.key(5))
    _ = int(jnp.max(labels))
    print(f"[mask] 25-step 64x128x128 chain (compile+run): "
          f"{time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    labels = mask_fn(ms_params, jax.random.key(6))
    _ = int(jnp.max(labels))
    t_mask = time.perf_counter() - t0
    print(f"[mask] steady-state: {t_mask:.2f}s", flush=True)

    mask_channel = normalize_mask_channel(
        upsample_labels(labels, (N_SLICES, SIZE, SIZE)), ms.num_classes)

    ddim50 = DDIMParams.create(ldm.diffusion, 50)
    dpm20 = DDIMParams.create(ldm.diffusion, 20, method="uniform_lambda")
    r1 = measure("ddim-50 (reference)", ldm, ldm_params, mask_channel, ddim50)
    r2 = measure("dpm-20", ldm, ldm_params, mask_channel, dpm20, sampler="dpm")
    r3 = measure("dpm-20 + warm 0.4", ldm, ldm_params, mask_channel, dpm20,
                 warm=0.4, sampler="dpm")
    for name, (ttfs, cad) in (("ddim-50", r1), ("dpm-20", r2), ("dpm+warm", r3)):
        print(f"[summary] {name}: first CT slice after mask+{ttfs:.2f}s "
              f"(mask {t_mask:.2f}s) -> user-visible TTFS ~{t_mask + ttfs:.2f}s",
              flush=True)


if __name__ == "__main__":
    main()
