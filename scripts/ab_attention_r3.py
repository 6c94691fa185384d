"""Round-3 A/B: unrolled-k flash forward vs round-2 plain kernel, on-chip.

Measures (a) the kernel alone at the stage-2 hot site (BH=16, T=4096,
D=32 — the 512^2 ds-8 attention), (b) the full stage-2 DDIM chain at
512^2 with each variant.  Interleaved repeats (this tunnel shows ~25%
run-to-run noise on identical programs, memory: axon-tpu-environment).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/ab_attention_r3.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from jointimagegeneration_tpu.ops.pallas import flash_attention as fa


def build_kernel_chain(unrolled: bool, n=50):
    fa.UNROLLED_FORWARD[0] = unrolled

    @jax.jit
    def chain(q, k, v):
        def body(c, _):
            return fa.flash_attention(c, k, v), None

        out, _ = jax.lax.scan(body, q, None, length=n)
        return jnp.sum(out.astype(jnp.float32))

    return chain, n


def main():
    key = jax.random.key(0)
    kq, kk, kv = jax.random.split(key, 3)
    shape = (1, 16, 4096, 32)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)

    # correctness on-chip first
    fa.UNROLLED_FORWARD[0] = False
    ref = jax.jit(lambda q, k, v: fa.flash_attention(q, k, v))(q, k, v)
    fa.UNROLLED_FORWARD[0] = True
    new = jax.jit(lambda q, k, v: fa.flash_attention(q, k, v))(q, k, v)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - new.astype(jnp.float32))))
    print(f"max |plain - unrolled| on chip: {err:.5f}", flush=True)

    chains = {}
    for name, flag in (("plain", False), ("unrolled", True)):
        c, n = build_kernel_chain(flag)
        _ = float(c(q, k, v))  # compile + relay warm
        chains[name] = (c, n)
    # interleaved repeats
    times = {"plain": [], "unrolled": []}
    for rep in range(4):
        for name, (c, n) in chains.items():
            t0 = time.perf_counter()
            _ = float(c(q, k, v))
            times[name].append((time.perf_counter() - t0) / n * 1e3)
    for name, ts in times.items():
        print(f"kernel {name}: per-call {min(ts):.3f} ms (all: {[round(t,3) for t in ts]})", flush=True)

    # full stage-2 chain per variant
    from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
    from jointimagegeneration_tpu.models import SliceLDM

    size, chain_steps = 512, 10
    model = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=1000,
        model_channels=128, channel_mult=(1, 2, 4, 4, 5),
        attention_resolutions=(32, 16, 8), num_res_blocks=2,
        num_head_channels=32, dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.key(1), size)
    ddim = DDIMParams.create(model.diffusion, chain_steps)
    cond = jnp.zeros((1, size, size, 2), jnp.bfloat16)

    runs = {}
    for name, flag in (("plain", False), ("unrolled", True)):
        fa.UNROLLED_FORWARD[0] = flag

        @jax.jit
        def run(params, key):
            s = model.sample_slice(params, key, cond, ddim)
            return jnp.sum(s)

        _ = float(run(params, jax.random.key(2)))  # compile
        runs[name] = run
    stimes = {"plain": [], "unrolled": []}
    for rep in range(4):
        for name, run in runs.items():
            t0 = time.perf_counter()
            _ = float(run(params, jax.random.key(3 + rep)))
            stimes[name].append((time.perf_counter() - t0) / chain_steps * 1e3)
    for name, ts in stimes.items():
        best = min(ts)
        print(f"stage2 chain {name}: {best:.2f} ms/step = {1e3/best:.2f} steps/s "
              f"(all: {[round(t,2) for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
