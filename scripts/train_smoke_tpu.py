"""Flagship-scale TRAINING smoke on the real chip (round 3 continuation).

Proves the production training path end-to-end at full reference scale
(64x128x128, base-64 UNet, bf16, remat, AdamW+EMA): N steps of the real
jitted train step on synthetic batches, loss reported every 10 steps,
grad_finite tracked, then a checkpoint save + restore round trip and one
more step from the restored state.  The CPU tier already proves learning
on tiny models (BENCH_NOTES 'End-to-end learning proof'); this pins the
full-size path + orbax round trip on TPU hardware and records the
sustained steps/s outside the bench harness.

Run (TPU, one process at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/train_smoke_tpu.py
"""

import os
import time

import jax
import jax.numpy as jnp

if jax.default_backend() != "cpu":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from jointimagegeneration_tpu.models import MaskSampler
from jointimagegeneration_tpu.train import EMATrainState, build_optimizer, make_mask_train_step

SPATIAL = (64, 128, 128)
STEPS = 50


def main():
    model = MaskSampler.create(
        num_classes=12, time_steps=1000, model_channels=64,
        channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
        num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16, remat=True,
    )
    params = model.init_params(jax.random.key(0), SPATIAL, cond_channels=1)
    tx = build_optimizer("AdamW", 1e-4)
    state = EMATrainState.create(params, tx)
    step = jax.jit(make_mask_train_step(model, jnp.ones((12,))), donate_argnums=(0,))

    # synthetic but non-trivial batch: blocky organ-ish labels
    k = jax.random.key(1)
    lab = jax.random.randint(k, (1, 16, 32, 32), 0, 12)
    lab = jax.image.resize(lab.astype(jnp.float32), (1, *SPATIAL), "nearest").astype(jnp.int32)
    batch = {
        "mask": jax.nn.one_hot(lab, 12),
        "image": (lab[..., None].astype(jnp.float32) / 11.0),
    }

    state, m = step(state, batch, jax.random.key(2))
    print(f"[compile+step0] loss={float(m['loss']):.4f}", flush=True)
    t0 = time.perf_counter()
    first = last = None
    for i in range(1, STEPS + 1):
        state, m = step(state, batch, jax.random.key(2 + i))
        if i % 10 == 0 or i == 1:
            loss = float(m["loss"])  # syncs
            gf = float(m["grad_finite"])
            first = loss if first is None else first
            last = loss
            print(f"[step {i:3d}] loss={loss:.4f} grad_finite={gf}", flush=True)
    dt = time.perf_counter() - t0
    print(f"[sustained] {STEPS / dt:.3f} steps/s over {STEPS} steps "
          f"(loss {first:.2f} -> {last:.2f} on the fixed batch)", flush=True)

    # checkpoint round trip at full scale
    from jointimagegeneration_tpu.core.checkpoint import CheckpointManager

    t0 = time.perf_counter()
    mgr = CheckpointManager("/tmp/train_smoke_ckpt")
    host_state = jax.device_get(state)
    mgr.save(int(state.step), host_state)
    mgr.wait()
    t_save = time.perf_counter() - t0
    t0 = time.perf_counter()
    restored = mgr.restore(host_state)
    t_load = time.perf_counter() - t0
    assert int(restored.step) == int(state.step)
    state2 = jax.device_put(restored)
    state2, m2 = step(state2, batch, jax.random.key(999))
    print(f"[checkpoint] save {t_save:.1f}s, restore {t_load:.1f}s, "
          f"post-restore step loss={float(m2['loss']):.4f} (finite={float(m2['grad_finite'])})",
          flush=True)


if __name__ == "__main__":
    main()
