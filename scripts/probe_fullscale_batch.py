"""Full-scale batched TRAINING compile+measure (VERDICT r4 #3).

The round-3 ladder proved b=8 a 2.35x/sample win at 256², but every
full-scale b>1 train graph (stage-2 512² b≥2, stage-1 3D b=2) died in
the remote compile helper ("HTTP 500: tpu_compile_helper subprocess exit
code 1").  This probe attacks that ceiling on a config ladder and
records, for each rung: compiled? (exact failure text if not), HBM fit
(XLA memory_analysis), steps/s and per-sample rate.

Ladder (most valuable first):
  * stage-2 512² b=2 / b=4, remat on   (production train size)
  * stage-2 384² b=8, remat on         (nearest-to-full b=8 sweet spot)
  * stage-1 3D 64x128x128 b=2, remat on
Each rung runs in a try/except so one helper 500 doesn't end the probe.

Run (TPU, alone):  PYTHONPATH=/root/repo:/root/.axon_site \
    python -u scripts/probe_fullscale_batch.py
"""

import json
import os
import time
import traceback

import jax
import jax.numpy as jnp

if jax.default_backend() != "cpu":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from jointimagegeneration_tpu.models import MaskSampler, SliceLDM
from jointimagegeneration_tpu.train import (EMATrainState, build_optimizer,
                                            make_ldm_train_step, make_mask_train_step)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def run_stage2(size, b, remat, n=3):
    model = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=1000,
        model_channels=128, channel_mult=(1, 2, 4, 4, 5),
        attention_resolutions=(32, 16, 8), num_res_blocks=2,
        num_head_channels=32, dtype=jnp.bfloat16, remat=remat,
    )
    params = model.init_params(jax.random.key(1), size)
    state = EMATrainState.create(params, build_optimizer("AdamW", 1e-4))
    jstep = jax.jit(make_ldm_train_step(model), donate_argnums=(0,))
    batch = {"image": jnp.zeros((b, size, size, 1)),
             "cond": jnp.zeros((b, size, size, 2))}
    t0 = time.perf_counter()
    lowered = jstep.lower(state, batch, jax.random.key(1))
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    try:
        ma = compiled.memory_analysis()
        peak = getattr(ma, "temp_size_in_bytes", 0) + getattr(ma, "argument_size_in_bytes", 0)
    except Exception:
        peak = None
    state, m = jstep(state, batch, jax.random.key(1))
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for i in range(n):
        state, m = jstep(state, batch, jax.random.key(2 + i))
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    return {"compile_s": round(t_compile, 1), "peak_bytes": peak,
            "steps_per_s": round(1.0 / dt, 4), "samples_per_s": round(b / dt, 4)}


def run_stage1(b, remat, n=3):
    spatial = (64, 128, 128)
    model = MaskSampler.create(
        num_classes=12, time_steps=1000, model_channels=64,
        channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
        num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16, remat=remat,
    )
    params = model.init_params(jax.random.key(0), spatial, cond_channels=1)
    state = EMATrainState.create(params, build_optimizer("AdamW", 1e-4))
    jstep = jax.jit(make_mask_train_step(model, class_weights=jnp.ones((12,))),
                    donate_argnums=(0,))
    batch = {"mask": jax.nn.one_hot(jnp.zeros((b, *spatial), jnp.int32), 12),
             "image": jnp.zeros((b, *spatial, 1))}
    t0 = time.perf_counter()
    jstep.lower(state, batch, jax.random.key(1)).compile()
    t_compile = time.perf_counter() - t0
    state, m = jstep(state, batch, jax.random.key(1))
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for i in range(n):
        state, m = jstep(state, batch, jax.random.key(2 + i))
    _ = float(m["loss"])
    dt = (time.perf_counter() - t0) / n
    return {"compile_s": round(t_compile, 1),
            "steps_per_s": round(1.0 / dt, 4), "samples_per_s": round(b / dt, 4)}


RUNGS = [
    ("stage2_512_b2_remat", lambda: run_stage2(512, 2, True)),
    ("stage2_512_b4_remat", lambda: run_stage2(512, 4, True)),
    ("stage2_384_b8_remat", lambda: run_stage2(384, 8, True)),
    ("stage1_3d_b2_remat", lambda: run_stage1(2, True)),
    # b=1 controls for the 384² b=8 per-sample claim (same remat setting
    # and the production no-remat default)
    ("stage2_384_b1_remat", lambda: run_stage2(384, 1, True)),
    ("stage2_384_b1", lambda: run_stage2(384, 1, False)),
]


def main():
    only = set(filter(None, os.environ.get("PROBE_ONLY", "").split(",")))
    for name, fn in RUNGS:
        if only and name not in only:
            continue
        try:
            res = fn()
            emit(rung=name, ok=True, **res)
        except Exception as e:
            emit(rung=name, ok=False, error=str(e)[:500],
                 kind=type(e).__name__)
            traceback.print_exc()


if __name__ == "__main__":
    main()
