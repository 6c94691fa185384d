"""Round-3 A/B: remat POLICY on the full-scale stage-1 train step.

Plain per-ResBlock remat (saves only block inputs; backward recomputes
the conv-bound forward ~= 3x fwd FLOPs) vs `remat_policy='conv_outputs'`
(jax.checkpoint save_only_these_names: conv results saved, only GN/SiLU
glue recomputes).  VERDICT round-2 #4.  Memory matters as much as time:
no-remat OOMs 16 GB HBM by ~170 MB, so the policy variant must stay
under the ceiling while saving ~2 big tensors per ResBlock.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/ab_remat_policy_r3.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from jointimagegeneration_tpu.models import MaskSampler
from jointimagegeneration_tpu.train import EMATrainState, build_optimizer, make_mask_train_step


def build(policy):
    spatial = (64, 128, 128)
    model = MaskSampler.create(
        num_classes=12, time_steps=1000, model_channels=64,
        channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
        num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16,
        remat=True, remat_policy=policy,
    )
    params = model.init_params(jax.random.key(0), spatial, cond_channels=1)
    tx = build_optimizer("AdamW", 1e-4)
    state = EMATrainState.create(params, tx)
    step = jax.jit(make_mask_train_step(model, class_weights=jnp.ones((12,))),
                   donate_argnums=(0,))
    batch = {
        "mask": jax.nn.one_hot(jnp.zeros((1, *spatial), jnp.int32), 12),
        "image": jnp.zeros((1, *spatial, 1)),
    }
    return step, state, batch


def main():
    results = {}
    for name, policy in (("plain", None), ("conv_outputs", "conv_outputs")):
        step, state, batch = build(policy)
        try:
            state, m = step(state, batch, jax.random.key(1))
            _ = float(m["loss"])  # compile + relay warm
        except Exception as e:
            print(f"{name}: FAILED ({type(e).__name__}: {str(e)[:200]})", flush=True)
            continue
        ts = []
        for i in range(4):
            t0 = time.perf_counter()
            state, m = step(state, batch, jax.random.key(2 + i))
            _ = float(m["loss"])
            ts.append(time.perf_counter() - t0)
        results[name] = min(ts)
        print(f"{name}: best {min(ts)*1e3:.1f} ms/step = {1/min(ts):.3f} steps/s "
              f"(all: {[round(t*1e3,1) for t in ts]})", flush=True)
        del step, state, batch
    if len(results) == 2:
        print(f"speedup conv_outputs/plain: {results['plain']/results['conv_outputs']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
