"""Serving fast-route probe: 8 concurrent volumes x dpm-20(+warm-start)
autoregressive slice chains at 256² on ONE chip.

The bench's serving leg measures the reference route (ddim-50 slice
chains, 70.2% MFU, 50.9 s/volume amortized).  This probe composes the
two measured fast knobs at the serving batch size: DPM-Solver++(2M) on
uniform-log-SNR nodes (20 steps; reference per-slice semantics kept) and
`warm_start` (truncated per-slice chains seeded from the previous slice;
opt-in, semantics differ from the reference).  Batched sample_volume IS
the production serving program (cli/serve batching).

Zero eager device work, per BENCH_NOTES round 5: shape_init params,
CPU-built schedules, checksum sync baked into the program.

Run (TPU, alone): PYTHONPATH=/root/repo:/root/.axon_site python -u
scripts/probe_serving_fast.py
"""

import os
import time

import jax

if jax.default_backend() != "cpu":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
from jointimagegeneration_tpu.models import SliceLDM
from jointimagegeneration_tpu.utils.fast_init import shape_init

SIZE, B, D_CHUNK, FULL_D = 256, 8, 32, 128

cpu = jax.devices("cpu")[0]
dev = jax.devices()[0]

with jax.default_device(cpu):
    ldm = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=1000,
        model_channels=128, channel_mult=(1, 2, 4, 4, 5),
        attention_resolutions=(32, 16, 8), num_res_blocks=2,
        num_head_channels=32, dtype=jnp.bfloat16)
    dpm20 = DDIMParams.create(ldm.diffusion, 20, method="uniform_lambda")

params = shape_init(lambda k: ldm.init_params(k, SIZE), seed=1, device=dev)
mask = jax.device_put(np.zeros((B, D_CHUNK, SIZE, SIZE, 1), np.float32), dev)
init0 = jax.device_put(np.zeros((B, SIZE, SIZE, 1), np.float32), dev)


def dkey(seed):
    with jax.default_device(cpu):
        k = jax.random.key(seed)
    return jax.device_put(k, dev)


for warm, label in [(None, "dpm20"), (0.4, "dpm20_warm04")]:

    @jax.jit
    def run(params, key, mask, init):
        vol = ldm.sample_volume(params, key, mask, dpm20, init_slice=init,
                                sampler="dpm", warm_start=warm)
        return jnp.sum(vol)

    _ = float(run(params, dkey(1), mask, init0))  # compile/load + relay warm
    t0 = time.perf_counter()
    _ = float(run(params, dkey(2), mask, init0))
    dt = time.perf_counter() - t0
    per_volume_full = dt * (FULL_D / D_CHUNK) / B
    slice_chains = B * D_CHUNK
    print(f"{label}: {dt:.2f} s for {B} volumes x {D_CHUNK} slices "
          f"({slice_chains} slice chains) -> amortized "
          f"{per_volume_full:.2f} s per 128-slice volume at batch {B}",
          flush=True)
