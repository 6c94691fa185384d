"""d_head=64 vs the reference's d_head=32: the one attention lever left.

The round-3 attention post-mortem (BENCH_NOTES) proved the flash kernel
sits at its serialized VPU exp/max/sum floor at d_head=32 (the reference's
num_head_channels, ccdm params.yml:72 / ruijin-ldm yaml:30): per score
element the VPU does ~4-5 ops against only 4*32=128 MXU MACs.  Doubling
d_head halves the number of heads (QKV projection weights are the SAME
shapes — heads = ch // d_head is just the split), so the score tensor
halves and the kernel should approach MXU-bound.  This probe measures the
real stage-2 chain + the isolated hot attention site at both settings.

Architecture note: d_head changes the function (attention grouping), so
it is a TRAIN-TIME choice — a d_head=32 checkpoint cannot switch at
inference.  If the win is real it ships as a documented opt-in config
(`unet: {num_head_channels: 64}`), default 32 for reference parity.

Run (TPU, one process at a time):
  PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_dhead.py
"""

import os
import time

import jax
import jax.numpy as jnp

if jax.default_backend() != "cpu":
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
    jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from jointimagegeneration_tpu.diffusion.ddim import DDIMParams
from jointimagegeneration_tpu.models import SliceLDM
from jointimagegeneration_tpu.ops.attention import multi_head_self_attention

SIZE = 512
STEPS = 10


def chain_ab(d_head: int) -> float:
    model = SliceLDM.create(
        image_channels=1, cond_channels=2, timesteps=1000,
        model_channels=128, channel_mult=(1, 2, 4, 4, 5),
        attention_resolutions=(32, 16, 8), num_res_blocks=2,
        num_head_channels=d_head, dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.key(1), SIZE)
    ddim = DDIMParams.create(model.diffusion, STEPS)
    cond = jnp.zeros((1, SIZE, SIZE, 2), jnp.bfloat16)

    @jax.jit
    def run(params, key):
        return jnp.sum(model.sample_slice(params, key, cond, ddim))

    _ = float(run(params, jax.random.key(2)))  # compile + warm fetch
    best = min(
        _timed(lambda i=i: float(run(params, jax.random.key(3 + i))))
        for i in range(3)
    )
    per_step = best / STEPS
    print(f"[chain 512² d_head={d_head}] {per_step * 1e3:.1f} ms/step "
          f"({1.0 / per_step:.2f} steps/s)", flush=True)
    return per_step


def attn_site_ab(d_head: int) -> float:
    # The stage-2 hot site: ds=32 level, 64x64 spatial, 512 ch -> T=4096.
    ch, t = 512, 4096
    heads = ch // d_head
    qkv = jax.random.normal(jax.random.key(0), (1, t, 3 * ch), jnp.bfloat16)

    @jax.jit
    def run(qkv):
        def body(c, _):
            o = multi_head_self_attention(c, heads)
            return jnp.concatenate([o, o, o], axis=-1), ()
        out, _ = jax.lax.scan(body, qkv, length=50)
        return jnp.sum(out)

    _ = float(run(qkv))
    best = min(_timed(lambda i=i: float(run(qkv))) for i in range(3))
    per_call = best / 50
    print(f"[attn T=4096 ch=512 d_head={d_head} (heads={heads})] "
          f"{per_call * 1e3:.3f} ms/call (incl. concat glue)", flush=True)
    return per_call


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    a32 = attn_site_ab(32)
    a64 = attn_site_ab(64)
    print(f"isolated attention: d64/d32 = {a64 / a32:.3f}x time "
          f"({a32 / a64:.2f}x speedup)", flush=True)
    c32 = chain_ab(32)
    c64 = chain_ab(64)
    print(f"chain: d_head=32 {1 / c32:.2f} steps/s -> d_head=64 "
          f"{1 / c64:.2f} steps/s ({c32 / c64:.2f}x)", flush=True)
