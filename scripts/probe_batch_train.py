"""Batched-training throughput on the real chip (beyond-reference probe).

The reference trains BOTH stages at batch_size 1 (ccdm/params.yml:24,
latentdiffusion/configs/latent-diffusion/ruijin-ldm_from_controlnet.yaml:73)
— a CUDA-era choice. On TPU, batch>1 packs the MXU better IF the conv
schedules hold up; the round-3 CFG-batching measurement showed per-sample
UNet *inference* cost RISES 1.34-1.43x with batch at 256² (BENCH_NOTES),
so whether batched TRAINING (fwd+bwd, remat, different shapes) pays is an
open empirical question this probe answers:

  * stage-1 (3D 64x128x128, base-64, remat, AdamW+EMA): batch 1 vs 2
  * stage-2 (2D 512², base-128, AdamW+EMA): batch 1 vs 2 vs 4

Reports per-SAMPLE steps/s (throughput view) for each; OOM at a given
batch is caught and reported as the capacity ceiling.

Run (TPU, one process at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_batch_train.py
"""

import os
import time

import jax
import jax.numpy as jnp

if jax.default_backend() != "cpu":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from jointimagegeneration_tpu.models import MaskSampler, SliceLDM
from jointimagegeneration_tpu.train import EMATrainState, build_optimizer, make_ldm_train_step, make_mask_train_step

SPATIAL = (64, 128, 128)
SIZE = 512


def time_step(jstep, state, batch, n=5):
    state, m = jstep(state, batch, jax.random.key(1))
    _ = float(m["loss"])  # compile + relay warm
    t0 = time.perf_counter()
    for i in range(n):
        state, m = jstep(state, batch, jax.random.key(2 + i))
    _ = float(m["loss"])
    return (time.perf_counter() - t0) / n


def stage1(batch_size):
    model = MaskSampler.create(
        num_classes=12, time_steps=1000, model_channels=64,
        channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
        num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16, remat=True,
    )
    params = model.init_params(jax.random.key(0), SPATIAL, cond_channels=1)
    state = EMATrainState.create(params, build_optimizer("AdamW", 1e-4))
    jstep = jax.jit(make_mask_train_step(model, jnp.ones((12,))), donate_argnums=(0,))
    batch = {
        "mask": jax.nn.one_hot(jnp.zeros((batch_size, *SPATIAL), jnp.int32), 12),
        "image": jnp.zeros((batch_size, *SPATIAL, 1)),
    }
    dt = time_step(jstep, state, batch)
    print(f"[stage1 b={batch_size}] {dt:.3f} s/step = "
          f"{batch_size / dt:.3f} samples/s ({1 / dt:.3f} steps/s)", flush=True)


def stage2(batch_size):
    model = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=1000,
        model_channels=128, channel_mult=(1, 2, 4, 4, 5),
        attention_resolutions=(32, 16, 8), num_res_blocks=2,
        num_head_channels=32, dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.key(1), SIZE)
    state = EMATrainState.create(params, build_optimizer("AdamW", 1e-4))
    jstep = jax.jit(make_ldm_train_step(model), donate_argnums=(0,))
    batch = {
        "image": jnp.zeros((batch_size, SIZE, SIZE, 1)),
        "cond": jnp.zeros((batch_size, SIZE, SIZE, 2)),
    }
    dt = time_step(jstep, state, batch)
    print(f"[stage2 b={batch_size}] {dt:.3f} s/step = "
          f"{batch_size / dt:.3f} samples/s ({1 / dt:.3f} steps/s)", flush=True)


def stage2_small(batch_size, size=256):
    """Batching ladder at 256² — the full-scale b>1 train graphs exceed the
    remote compile helper's memory ceiling on this box (HTTP 500 subprocess
    exit; same ceiling bench.py documents for the scan-of-train-step), so
    the per-sample-batching question is answered at the slice size the
    two-stage pipeline actually runs (256²), where the graphs compile."""
    model = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=1000,
        model_channels=128, channel_mult=(1, 2, 4, 4, 5),
        attention_resolutions=(32, 16, 8), num_res_blocks=2,
        num_head_channels=32, dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.key(1), size)
    state = EMATrainState.create(params, build_optimizer("AdamW", 1e-4))
    jstep = jax.jit(make_ldm_train_step(model), donate_argnums=(0,))
    batch = {
        "image": jnp.zeros((batch_size, size, size, 1)),
        "cond": jnp.zeros((batch_size, size, size, 2)),
    }
    dt = time_step(jstep, state, batch)
    print(f"[stage2@{size} b={batch_size}] {dt:.3f} s/step = "
          f"{batch_size / dt:.3f} samples/s ({1 / dt:.3f} steps/s)", flush=True)


def main():
    which = os.environ.get("PROBE_LEGS", "full")
    if which in ("full", "all"):
        for b in (1, 2):
            try:
                stage1(b)
            except Exception as e:
                print(f"[stage1 b={b}] FAILED: {str(e)[:300]}", flush=True)
        for b in (1, 2, 4):
            try:
                stage2(b)
            except Exception as e:
                print(f"[stage2 b={b}] FAILED: {str(e)[:300]}", flush=True)
    if which in ("ladder", "all"):
        for b in (1, 2, 4, 8):
            try:
                stage2_small(b)
            except Exception as e:
                print(f"[stage2@256 b={b}] FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
