"""Flagship-scale cost of TEXT cross-attention in the stage-1 denoise step.

ROADMAP item 7 (text conditioning at scale): the reference wires text
context through SpatialTransformer cross-attn but ships it inert
(SURVEY §2.1 UNet-factory row).  Our UNet makes it live via context_dim.
This probe quantifies what turning it ON costs at the flagship shape:
25-step denoise chain at 64x128x128, base 64, bf16, with and without a
(1, 64, 768) BERT-sized context at the 3 attention sites.
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
import jax, jax.numpy as jnp

from jointimagegeneration_tpu.models import MaskSampler

spatial = (64, 128, 128)
chain = 25

def run_case(name, context_shape):
    model = MaskSampler.create(
        num_classes=12, time_steps=1000, model_channels=64,
        channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
        num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16,
        context_dim=None if context_shape is None else context_shape[-1],
    )
    params = model.init_params(jax.random.key(0), spatial, cond_channels=1,
                               context_shape=context_shape)
    cond = jnp.zeros((1, *spatial, 1), jnp.bfloat16)
    ctx = None if context_shape is None else (
        jax.random.normal(jax.random.key(5), (1, *context_shape), jnp.bfloat16))

    @jax.jit
    def run_chain(params, key):
        x = model.sample(params, key, (1, *spatial), cond=cond,
                         num_steps=chain, context=ctx)
        return jnp.sum(x[..., 0])

    _ = float(run_chain(params, jax.random.key(1)))  # compile
    t0 = time.perf_counter(); n = 3
    for i in range(n):
        _ = float(run_chain(params, jax.random.key(2 + i)))
    dt = (time.perf_counter() - t0) / (n * chain)
    print(f"{name}: {1.0/dt:.3f} steps/s ({dt*1e3:.1f} ms/step)", flush=True)
    return dt

base = run_case("no-context (production)", None)
xat = run_case("text cross-attn (1,64,768)", (64, 768))
print(f"cross-attn overhead: {100*(xat-base)/base:.1f}%", flush=True)
