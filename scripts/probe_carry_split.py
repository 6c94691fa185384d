"""Two targeted probes at the stage-1 data-formatting cost (12.6 ms/step).

exp1 — scan-carry traffic: the sampler carries the f32 one-hot volume
(50 MB at 64x128x128x12) between steps; `jit(run)/while` copy events are
3.1 ms/step in the round-3 trace.  B carries integer labels (4 MB int32)
and re-one-hots inside the body — bit-identical math (one_hot(argmax-
sampled idx) both ways).

exp2 — skip-concat materialization: up-path blocks run
conv(SiLU(GN(concat(h, skip)))) + 1x1(concat(h, skip)); with 32 groups
over 128 channels every GN group lies wholly in one part, so the concat
never needs materializing: GN/SiLU per part, conv = sum of two
half-input convs (and same for the 1x1 skip projection).  A/B at the
level-0 up-block shape (64ch h + 64ch skip, 64x128x128, bf16, b=1).
"""
import os, time, functools
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.jax_cache"))
import jax, jax.numpy as jnp
import numpy as np

from jointimagegeneration_tpu.models import MaskSampler
from jointimagegeneration_tpu.diffusion.categorical import sample_one_hot
from jointimagegeneration_tpu.models.mask_sampler import sampling_t_values


def timed(fn, args, chain, n=3, tag=""):
    _ = float(fn(*args))
    t0 = time.perf_counter()
    for _i in range(n):
        _ = float(fn(*args))
    dt = (time.perf_counter() - t0) / (n * chain)
    print(f"{tag}: {1.0/dt:.3f} steps/s ({dt*1e3:.2f} ms/step)", flush=True)
    return dt


def exp1():
    spatial = (64, 128, 128)
    chain = 25
    model = MaskSampler.create(
        num_classes=12, time_steps=1000, model_channels=64,
        channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
        num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16,
    )
    params = model.init_params(jax.random.key(0), spatial, cond_channels=1)
    cond = jnp.zeros((1, *spatial, 1), jnp.bfloat16)

    @jax.jit
    def run_a(params, key):
        x = model.sample(params, key, (1, *spatial), cond=cond, num_steps=chain)
        return jnp.sum(x[..., 0])

    t_values = jnp.asarray(sampling_t_values(model.diffusion.time_steps, chain))

    @jax.jit
    def run_b(params, key):
        key, sub = jax.random.split(key)
        x0 = sample_one_hot(sub, jnp.full((1, *spatial, 12), 1.0 / 12))
        lab = jnp.argmax(x0, -1).astype(jnp.int32)

        def body(carry, t):
            lab, k = carry
            k, sub = jax.random.split(k)
            xt = jax.nn.one_hot(lab, 12, dtype=jnp.float32)
            t_b = jnp.full((1,), t, jnp.int32)
            xt = model.denoise_step(params, sub, xt, t_b, cond=cond)
            return (jnp.argmax(xt, -1).astype(jnp.int32), k), None

        (lab, _), _ = jax.lax.scan(body, (lab, key), t_values)
        return jnp.sum(jax.nn.one_hot(lab, 12)[..., 0])

    a = timed(run_a, (params, jax.random.key(1)), chain, tag="exp1 A onehot-f32 carry")
    b = timed(run_b, (params, jax.random.key(1)), chain, tag="exp1 B int32-label carry")
    print(f"exp1: B/A = {b/a:.3f}", flush=True)


def exp2():
    spatial = (64, 128, 128)
    C = 64
    k3 = (3, 3, 3)
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.standard_normal((1, *spatial, C)), jnp.bfloat16)
    s = jnp.asarray(rng.standard_normal((1, *spatial, C)), jnp.bfloat16)
    gnsc = jnp.asarray(rng.standard_normal((2 * C,)), jnp.float32)
    gnb = jnp.asarray(rng.standard_normal((2 * C,)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((*k3, 2 * C, C)) * 0.02, jnp.float32)
    b1 = jnp.zeros((C,), jnp.float32)
    ks = jnp.asarray(rng.standard_normal((1, 1, 1, 2 * C, C)) * 0.02, jnp.float32)

    def gn(x, sc, bi, groups):
        b, *sp, c = x.shape
        xf = x.astype(jnp.float32).reshape(b, -1, groups, c // groups)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = xf.var(axis=(1, 3), keepdims=True)
        xn = ((xf - mean) * jax.lax.rsqrt(var + 1e-6)).reshape(x.shape)
        return (xn * sc + bi).astype(x.dtype)

    def conv(x, k, b):
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32)
        return (y + b).astype(x.dtype)

    chain = 20

    @jax.jit
    def run_a(h, s):
        def body(c, _):
            h, s = c
            cat = jnp.concatenate([h, s], axis=-1)
            y = conv(jax.nn.silu(gn(cat, gnsc, gnb, 32)), k1, b1)
            r = conv(cat, ks, b1)
            return (y + r, s), None

        (y, _), _ = jax.lax.scan(body, (h, s), None, length=chain)
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def run_b(h, s):
        def body(c, _):
            h, s = c
            th = jax.nn.silu(gn(h, gnsc[:C], gnb[:C], 16))
            ts = jax.nn.silu(gn(s, gnsc[C:], gnb[C:], 16))
            y = conv(th, k1[..., :C, :], b1) + conv(ts, k1[..., C:, :], 0.0)
            r = conv(h, ks[..., :C, :], b1) + conv(s, ks[..., C:, :], 0.0)
            return ((y + r).astype(h.dtype), s), None

        (y, _), _ = jax.lax.scan(body, (h, s), None, length=chain)
        return jnp.sum(y.astype(jnp.float32))

    # numeric equivalence at one step (f32 tolerance over bf16 inputs)
    a1 = float(run_a(h, s))
    b1v = float(run_b(h, s))
    print(f"exp2 outputs after {chain} iters: A={a1:.1f} B={b1v:.1f}", flush=True)
    a = timed(run_a, (h, s), chain, tag="exp2 A concat")
    b = timed(run_b, (h, s), chain, tag="exp2 B split")
    print(f"exp2: B/A = {b/a:.3f}", flush=True)


if __name__ == "__main__":
    exp1()
    exp2()
