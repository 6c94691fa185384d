"""Quality A/B of samplers at matched/reduced step counts (CPU, trained).

Same harness as eval_warm_start_quality.py: a tiny SliceLDM trained on
the synthetic slice task (GT exists by construction), whole volumes
generated against held-out GT mask volumes.  Compares the reference
configuration (ddim, 50 steps, uniform-t nodes) against DPM-Solver++(2M)
on uniform-log-SNR nodes at 20 and 10 steps, plus ddim-20 as the naive
step-cut control.  Expectation from the ODE-accuracy measurements
(tests/test_dpm_solver.py): dpm-20/uniform_lambda >= ddim-50/uniform in
sample fidelity at 2.5x fewer model calls.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/eval_sampler_quality.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from jointimagegeneration_tpu.data.datasets import SyntheticSliceDataset
from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
from jointimagegeneration_tpu.models import SliceLDM
from jointimagegeneration_tpu.train import EMATrainState, build_optimizer, make_ldm_train_step

SIZE, DEPTH, CLASSES = 16, 8, 4
TRAIN_STEPS, BATCH = 800, 16


def batches(ds, key):
    rng = np.random.default_rng(key)
    n = len(ds)
    while True:
        idx = rng.integers(0, n, size=BATCH)
        items = [ds[int(i)] for i in idx]
        yield {
            "image": jnp.asarray(np.stack([it["image"] for it in items])),
            "cond": jnp.asarray(np.stack([it["cond"] for it in items])),
        }


def minmax(x, axes):
    lo = x.min(axis=axes, keepdims=True)
    hi = x.max(axis=axes, keepdims=True)
    return (x - lo) / np.maximum(hi - lo, 1e-8)


def main():
    ldm = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=200, model_channels=16,
        channel_mult=(1, 2), attention_resolutions=(), num_res_blocks=1,
        num_head_channels=8,
    )
    params = ldm.init_params(jax.random.key(0), SIZE)
    state = EMATrainState.create(params, build_optimizer("Adam", 1e-3))
    step = jax.jit(make_ldm_train_step(ldm))

    train_ds = SyntheticSliceDataset(num_cases=64, slice_shape=(SIZE, SIZE),
                                     depth=DEPTH, num_classes=CLASSES, seed=0)
    t0, key = time.time(), jax.random.key(1)
    for i, batch in zip(range(TRAIN_STEPS), batches(train_ds, 7)):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub)
        if i % 200 == 0 or i == TRAIN_STEPS - 1:
            print(f"step {i}: loss {float(m['loss']):.4f}", flush=True)
    print(f"trained {TRAIN_STEPS} steps in {time.time() - t0:.0f}s", flush=True)

    eval_ds = SyntheticSliceDataset(num_cases=4, slice_shape=(SIZE, SIZE), depth=DEPTH,
                                    num_classes=CLASSES, include_volumes=True, seed=99)
    ema = state.ema_params

    variants = [
        ("ddim-50/uniform (reference config)", "ddim", 50, "uniform"),
        ("ddim-20/uniform (naive step cut)", "ddim", 20, "uniform"),
        ("dpm-20/uniform_lambda", "dpm", 20, "uniform_lambda"),
        ("dpm-10/uniform_lambda", "dpm", 10, "uniform_lambda"),
        ("dpm-5/uniform_lambda", "dpm", 5, "uniform_lambda"),
        ("dpm-3/uniform_lambda", "dpm", 3, "uniform_lambda"),
        ("ddim-5/uniform (naive)", "ddim", 5, "uniform"),
        ("ddim-3/uniform (naive)", "ddim", 3, "uniform"),
        ("ddim-50/uniform_lambda", "ddim", 50, "uniform_lambda"),
    ]
    results = {}
    for name, sampler, steps, disc in variants:
        ddim = DDIMParams.create(ldm.diffusion, steps, method=disc)
        mses, cohs = [], []
        for ci in range(len(eval_ds)):
            it = eval_ds[ci]
            mask = jnp.asarray(it["wholemask"])[None]
            gt = np.asarray(it["wholeimage"])[None]
            vol = np.asarray(ldm.sample_volume(ema, jax.random.key(100 + ci), mask,
                                               ddim, sampler=sampler))
            gt_n = minmax(gt, axes=(2, 3, 4))
            mses.append(float(np.mean((vol - gt_n) ** 2)))
            cohs.append(float(np.mean(np.abs(np.diff(vol, axis=1)))))
        results[name] = {"mse_to_gt": round(float(np.mean(mses)), 7),
                         "z_coherence_mean_abs_dz": round(float(np.mean(cohs)), 7),
                         "model_calls_per_slice": steps}
        print(f"{name}: {results[name]}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
