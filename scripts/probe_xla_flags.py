"""A/B XLA TPU compiler options on the two hot serving programs.

The rounds so far probed kernels, layouts, batching, and remat — but never
the XLA compiler's own knobs.  The one documented, commonly-useful TPU
knob for conv/fusion-heavy programs is the scoped-VMEM budget
(`xla_tpu_scoped_vmem_limit_kib`): it bounds how much VMEM fused loops may
claim, and raising it lets the fusion emitter pick deeper tiles for
bandwidth-bound pipelines (the stage-1 conv streaming ceiling,
BENCH_NOTES round 2).  Also sampled: the latency-hiding scheduler flag.

Options are passed per-compile via `jit(f).lower(args).compile(
compiler_options=...)` — NOT env XLA_FLAGS — because compile options
serialize through the axon remote-compile relay while the terminal-side
env may not reach it.

Usage:  python scripts/probe_xla_flags.py [variant ...]
        variants: base vmem32 vmem64 vmem128 lhs   (default: base vmem32 vmem64)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

if jax.default_backend() != "cpu":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

VARIANTS = {
    "base": {},
    "vmem32": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem128": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
}


def stage1_program():
    from jointimagegeneration_tpu.models import MaskSampler

    spatial = (64, 128, 128)
    model = MaskSampler.create(
        num_classes=12, time_steps=1000, model_channels=64,
        channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
        num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.key(0), spatial, cond_channels=1)
    cond = jnp.zeros((1, *spatial, 1), jnp.bfloat16)

    def run(params, key):
        x = model.sample(params, key, (1, *spatial), cond=cond, num_steps=25)
        return jnp.sum(x[..., 0])

    return "stage1_denoise25", run, (params, jax.random.key(1)), 25


def stage2_program():
    from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
    from jointimagegeneration_tpu.models import SliceLDM

    size = 512
    model = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=1000,
        model_channels=128, channel_mult=(1, 2, 4, 4, 5),
        attention_resolutions=(32, 16, 8), num_res_blocks=2,
        num_head_channels=32, dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.key(1), size)
    ddim = DDIMParams.create(model.diffusion, 10)
    cond = jnp.zeros((1, size, size, 2), jnp.bfloat16)

    def run(params, key):
        return jnp.sum(model.sample_slice(params, key, cond, ddim))

    return "stage2_ddim10_512", run, (params, jax.random.key(2)), 10


def time_compiled(compiled, args, iters=3):
    _ = float(compiled(*args))  # warm (relay fetch)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = float(compiled(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    picks = sys.argv[1:] or ["base", "vmem32", "vmem64"]
    for make in (stage1_program, stage2_program):
        name, run, args, steps = make()
        lowered = jax.jit(run).lower(*args)
        for v in picks:
            opts = VARIANTS[v]
            try:
                t0 = time.perf_counter()
                compiled = lowered.compile(compiler_options=opts or None)
                tc = time.perf_counter() - t0
                dt = time_compiled(compiled, args)
                print(f"{name} {v:8s} {dt*1e3/steps:8.2f} ms/step "
                      f"({steps/dt:6.2f} steps/s)  compile {tc:.0f}s", flush=True)
            except Exception as e:
                print(f"{name} {v:8s} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
