"""Benchmark: stage-1 categorical UNet denoise steps/sec/chip.

The primary BASELINE metric (BASELINE.md): denoise steps per second per
chip on the stage-1 workload — 12-class one-hot volume, reference UNet
(base 64, mult [1,2,2,4,5], attn at ds {32,16,8}, head_ch 32), one full
denoise step = UNet forward + closed-form categorical posterior +
categorical draw.  The reference publishes no numbers (it never recorded
its runtime counters), so vs_baseline is reported as null.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    from jointimagegeneration_tpu.models import MaskSampler

    spatial = (64, 128, 128)  # reference stage-1 volume (ccdm/datasets/ruijin.py:176-178)
    num_classes = 12
    model = MaskSampler.create(
        num_classes=num_classes,
        time_steps=1000,
        model_channels=64,
        channel_mult=(1, 2, 2, 4, 5),
        attention_resolutions=(32, 16, 8),
        num_res_blocks=2,
        num_head_channels=32,
        dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.key(0), spatial, cond_channels=1)

    @jax.jit
    def step(params, xt, t, cond, key):
        return model.denoise_step(params, key, xt, t, cond=cond)

    xt = jax.nn.one_hot(
        jax.random.randint(jax.random.key(1), (1, *spatial), 0, num_classes), num_classes, dtype=jnp.bfloat16
    )
    t = jnp.full((1,), 500, jnp.int32)
    cond = jnp.zeros((1, *spatial, 1), jnp.bfloat16)
    key = jax.random.key(2)

    # warmup / compile
    out = step(params, xt, t, cond, key)
    jax.block_until_ready(out)

    n_iters = 20
    t0 = time.perf_counter()
    x = xt
    for i in range(n_iters):
        x = step(params, x, t, cond, jax.random.fold_in(key, i))
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0

    steps_per_sec = n_iters / dt
    print(
        json.dumps(
            {
                "metric": "stage1_denoise_steps_per_sec_per_chip_64x128x128",
                "value": round(steps_per_sec, 4),
                "unit": "steps/s",
                "vs_baseline": None,
            }
        )
    )


if __name__ == "__main__":
    main()
