"""Benchmark: stage-1 categorical UNet denoise steps/sec/chip.

The primary BASELINE metric (BASELINE.md): denoise steps per second per
chip on the stage-1 workload — 12-class one-hot 64x128x128 volume,
reference UNet (base 64, mult [1,2,2,4,5], attn at ds {32,16,8},
head_ch 32).  One denoise step = UNet forward + closed-form categorical
posterior + categorical draw.

Measured the production way: the K-step reverse chain is ONE
`lax.scan`-compiled program (exactly how `MaskSampler.sample` runs), so
per-step Python dispatch — which dominates on this host — is excluded, as
it is in real sampling.  Timing is synced by fetching a scalar reduction
of the result (on this box `block_until_ready` alone does not await the
tunneled device, and the first device->host fetch pays a one-time ~100 s
relay setup which is excluded by a warmup fetch).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.  The
reference publishes no numbers (BASELINE.md), so vs_baseline is null.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from jointimagegeneration_tpu.models import MaskSampler

    spatial = (64, 128, 128)  # reference stage-1 volume (ccdm/datasets/ruijin.py:176-178)
    num_classes = 12
    chain_steps = 25
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
    cond = jnp.zeros((1, *spatial, 1), jnp.bfloat16)

    @jax.jit
    def run_chain(params, key):
        x = model.sample(params, key, (1, *spatial), cond=cond, num_steps=chain_steps)
        return jnp.sum(x[..., 0])  # scalar; forces the whole chain

    # warm: compile + first d2h (pays the one-time relay setup)
    _ = float(run_chain(params, jax.random.key(1)))

    n_iters = 3
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(n_iters):
        acc += float(run_chain(params, jax.random.key(2 + i)))  # fetch => full sync
    dt = time.perf_counter() - t0

    steps_per_sec = chain_steps * n_iters / dt
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
