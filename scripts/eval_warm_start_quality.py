"""Quality A/B of warm-start autoregression on a TRAINED tiny model (CPU).

The perf side of `warm_start` is settled (BENCH_NOTES round 3: f=0.4 gives
1.75x e2e at exactly the theoretical cost).  This script answers the
quality caveat with numbers on data where ground truth exists: train a
tiny SliceLDM on the synthetic slice task (image = windowed(labels*30 +
noise) — a deterministic function of the mask plus noise,
data/datasets.py:301), then generate whole volumes conditioned on
held-out GT mask volumes with warm_start off / 0.4 / 0.2 and compare:

  * per-slice MSE to the GT image volume (both sides per-slice min-max
    normalised, matching sample_volume's output convention), and
  * inter-slice coherence mean|x_z - x_{z-1}| vs the GT volume's own.

SDEdit truncation predicts: similar-or-better fidelity per slice (the
previous slice is a strong x0 guess for a strongly z-correlated volume)
and HIGHER z-coherence than independent full chains.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/eval_warm_start_quality.py
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
TRAIN_STEPS, BATCH, DDIM_STEPS = 800, 16, 25


def batches(ds, key):
    """Endless batches of (image, cond) from the synthetic slice task."""
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
        if i % 100 == 0 or i == TRAIN_STEPS - 1:
            print(f"step {i}: loss {float(m['loss']):.4f}", flush=True)
    print(f"trained {TRAIN_STEPS} steps in {time.time() - t0:.0f}s", flush=True)

    # held-out cases (different seed stream than training)
    eval_ds = SyntheticSliceDataset(num_cases=4, slice_shape=(SIZE, SIZE), depth=DEPTH,
                                    num_classes=CLASSES, include_volumes=True, seed=99)
    ddim = DDIMParams.create(ldm.diffusion, DDIM_STEPS)
    ema = state.ema_params

    results = {}
    for warm in (None, 0.4, 0.2):
        mses, cohs, gts = [], [], []
        for ci in range(len(eval_ds)):
            it = eval_ds[ci]
            mask = jnp.asarray(it["wholemask"])[None]          # (1, D, H, W, 1)
            gt = np.asarray(it["wholeimage"])[None]            # (1, D, H, W, 1)
            vol = ldm.sample_volume(ema, jax.random.key(100 + ci), mask, ddim,
                                    warm_start=warm)
            vol = np.asarray(vol)
            gt_n = minmax(gt, axes=(2, 3, 4))                  # per-slice, like sample_volume
            mses.append(float(np.mean((vol - gt_n) ** 2)))
            cohs.append(float(np.mean(np.abs(np.diff(vol, axis=1)))))
            gts.append(float(np.mean(np.abs(np.diff(gt_n, axis=1)))))
        results[str(warm)] = {
            "mse_to_gt": round(float(np.mean(mses)), 5),
            "z_coherence_mean_abs_dz": round(float(np.mean(cohs)), 5),
        }
        results["gt_z_coherence"] = round(float(np.mean(gts)), 5)
        print(f"warm={warm}: {results[str(warm)]}", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
