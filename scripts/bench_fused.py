"""On-chip A/B for the fused ResBlock Pallas path (round-2 perf push).

Measures, on the real TPU:
  1. one ResBlock, XLA vs fused, at the stage-1 level-0 and level-1 shapes;
  2. the flagship denoise step (12-class 64x128x128), baseline vs fused UNet;
  3. bit-match check fused vs unfused at the full shape (bf16 tolerance).

Run: timeout 1800 python -u scripts/bench_fused.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from jointimagegeneration_tpu.nn.blocks import ResBlock
from jointimagegeneration_tpu.models import MaskSampler


def timed(fn, *args, iters=10, label=""):
    r = fn(*args)
    _ = np.asarray(jnp.sum(r[0] if isinstance(r, tuple) else r))  # warm + relay
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _ = np.asarray(jnp.sum(r[0] if isinstance(r, tuple) else r))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:58s} {dt:9.2f} ms", flush=True)
    return dt


def scan_timed(step, init, iters, label):
    """Chain `iters` applications inside one jitted scan (BENCH_NOTES method)."""

    @jax.jit
    def run(x):
        def body(h, _):
            return step(h), None
        h, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(h.astype(jnp.float32))

    _ = float(run(init))
    t0 = time.perf_counter()
    v = float(run(init))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:58s} {dt:9.2f} ms/iter   (chk {v:.3e})", flush=True)
    return dt


def bench_resblock(shape, ch, label):
    x = jax.random.normal(jax.random.key(0), (1, *shape, ch), jnp.bfloat16)
    emb = jax.random.normal(jax.random.key(1), (1, 256), jnp.bfloat16)
    rb_u = ResBlock(ch, dims=3, fused=False)
    params = rb_u.init(jax.random.key(2), x, emb)
    params = jax.tree.map(lambda p: p if p.ndim < 5 else jax.random.normal(jax.random.key(9), p.shape) * 0.05, params)
    tu = scan_timed(lambda h: rb_u.apply(params, h, emb), x, 20, f"{label} XLA")
    yu = np.asarray(rb_u.apply(params, x, emb), np.float32)
    for mode in ("xla", "kernel"):
        rb_f = ResBlock(ch, dims=3, fused=mode)
        tf = scan_timed(lambda h: rb_f.apply(params, h, emb), x, 20, f"{label} fused[{mode}]")
        yf = np.asarray(rb_f.apply(params, x, emb), np.float32)
        err = np.max(np.abs(yu - yf)) / max(1e-6, np.max(np.abs(yu)))
        print(f"{label} fused[{mode}]: speedup {tu / tf:.2f}x  rel err {err:.4f}", flush=True)


def bench_flagship(fused):
    model = MaskSampler.create(
        num_classes=12, time_steps=1000, model_channels=64,
        channel_mult=(1, 2, 2, 4, 5), attention_resolutions=(32, 16, 8),
        num_res_blocks=2, num_head_channels=32, dtype=jnp.bfloat16,
        use_fused_resblock=fused,
    )
    spatial = (64, 128, 128)
    params = model.init_params(jax.random.key(0), (16, 16, 16), cond_channels=1)
    cond = jnp.zeros((1, *spatial, 1), jnp.bfloat16)

    @jax.jit
    def chain(params, key):
        x = jax.nn.one_hot(jnp.zeros((1, *spatial), jnp.int32), 12, dtype=jnp.bfloat16)
        x = model.sample(params, key, (1, *spatial), cond=cond, num_steps=10)
        return jnp.sum(x)

    _ = float(chain(params, jax.random.key(1)))
    t0 = time.perf_counter()
    v = float(chain(params, jax.random.key(2)))
    dt = (time.perf_counter() - t0) / 10 * 1e3
    print(f"flagship denoise step fused={fused}: {dt:.1f} ms/step = {1e3/dt:.2f} steps/s (chk {v:.3e})", flush=True)
    return dt


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    bench_resblock((64, 128, 128), 64, "ResBlock L0 64ch 64x128x128")
    bench_resblock((32, 64, 64), 128, "ResBlock L1 128ch 32x64x64")
    bench_resblock((16, 32, 32), 128, "ResBlock L2 128ch 16x32x32")
    import sys

    modes = sys.argv[1:] or [False, "xla"]
    times = [bench_flagship(m) for m in modes]
    if len(times) > 1:
        print(f"whole-model speedup: {times[0] / times[-1]:.2f}x", flush=True)
