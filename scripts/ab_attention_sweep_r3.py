"""Round-3 block sweep of the unrolled flash forward at the stage-2 hot
site (BH=16, T=4096, D=32).  Each config interleaves with the plain-1024
baseline to cancel the tunnel's run-to-run drift.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/ab_attention_sweep_r3.py
"""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from jointimagegeneration_tpu.ops.pallas import flash_attention as fa

N = 50


def chain_for(unrolled, bq, bk):
    fa.UNROLLED_FORWARD[0] = unrolled

    @jax.jit
    def chain(q, k, v):
        def body(c, _):
            return fa.flash_attention(c, k, v, block_q=bq, block_k=bk), None

        out, _ = jax.lax.scan(body, q, None, length=N)
        return jnp.sum(out.astype(jnp.float32))

    return chain


def main():
    kq, kk, kv = jax.random.split(jax.random.key(0), 3)
    shape = (1, 16, 4096, 32)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)

    base = chain_for(False, 1024, 1024)
    _ = float(base(q, k, v))
    configs = [(256, 512), (256, 1024), (256, 4096), (512, 512), (512, 1024),
               (512, 2048), (1024, 512), (1024, 1024), (1024, 2048)]
    cands = {}
    for bq, bk in configs:
        c = chain_for(True, bq, bk)
        try:
            _ = float(c(q, k, v))
            cands[(bq, bk)] = c
        except Exception as e:
            print(f"unrolled bq={bq} bk={bk}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)

    results = {cfg: [] for cfg in cands}
    base_ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        _ = float(base(q, k, v))
        base_ts.append((time.perf_counter() - t0) / N * 1e3)
        for cfg, c in cands.items():
            t0 = time.perf_counter()
            _ = float(c(q, k, v))
            results[cfg].append((time.perf_counter() - t0) / N * 1e3)
    print(f"plain 1024/1024: best {min(base_ts):.3f} ms (all {[round(t,3) for t in base_ts]})", flush=True)
    for cfg, ts in sorted(results.items(), key=lambda kv: min(kv[1])):
        print(f"unrolled bq={cfg[0]:4d} bk={cfg[1]:4d}: best {min(ts):.3f} ms "
              f"(all {[round(t,3) for t in ts]})", flush=True)


if __name__ == "__main__":
    main()
