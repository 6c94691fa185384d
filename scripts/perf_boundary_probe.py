"""Root-cause probe for the round-1 Pallas custom-call boundary cost.

Round-1 finding (ops/pallas/conv3d.py STATUS): conv3d_3x3_v2 beats XLA
1.3-1.5x in isolation at Cin>=128, but routing ONE site inside the full
UNet denoise step regressed 282 vs 120 ms.  Hypotheses to discriminate:

  H1 lost-fusion: the GN/SiLU epilogues around the routed conv no longer
     fuse, adding HBM round trips  -> cost scales with activation size,
     reproducible in a medium chain, mitigated by fusing the epilogue
     into the kernel (activate=True) and routing conv pairs.
  H2 all-or-nothing layout: mixing XLA convs and pallas convs forces
     relayouts at each transition -> routing ALL convs of a stage chain
     should be FASTER than routing one.
  H3 scan interaction: the loss appears only under lax.scan (the sampler
     loop) -> compare chain-in-scan vs unrolled.
  H4 fixed per-call overhead -> cost independent of shape.

Run on the real TPU (default env):
    PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/perf_boundary_probe.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from jointimagegeneration_tpu.ops.pallas.conv3d import conv3d_3x3_v2


def timed(fn, *args, iters=5, label=""):
    r = fn(*args)
    _ = float(jnp.sum(r) if isinstance(r, jax.Array) else r)  # warm + relay
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
        _ = float(jnp.sum(r) if isinstance(r, jax.Array) else r)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:55s} {dt:9.2f} ms", flush=True)
    return dt


def gn_silu(x, groups=32):
    c = x.shape[-1]
    g = min(groups, c)
    xr = x.reshape(*x.shape[:-1], g, c // g).astype(jnp.float32)
    mean = xr.mean(axis=(-1, -4, -3, -2), keepdims=True) if x.ndim == 5 else xr.mean(axis=(-1, -3, -2), keepdims=True)
    var = ((xr - mean) ** 2).mean(axis=(-1, -4, -3, -2), keepdims=True) if x.ndim == 5 else ((xr - mean) ** 2).mean(axis=(-1, -3, -2), keepdims=True)
    xn = ((xr - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(x.shape).astype(x.dtype)
    return xn * jax.nn.sigmoid(xn)


def xla_conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype,
    )


def make_chain(n_stages, route, scan=False, tile_h=8):
    """n_stages of GN+SiLU+conv at constant C; `route[i]` = pallas for stage i."""

    def stage(x, k, use_pallas):
        h = gn_silu(x)
        if use_pallas:
            return x + conv3d_3x3_v2(h, k, tile_h, False)
        return x + xla_conv(h, k)

    @jax.jit
    def run(x, ks):
        if scan:
            def body(h, i):
                # NOTE scan requires uniform body; only all-or-nothing routing
                h = stage(h, ks[0], route[0])
                return h, None
            h, _ = jax.lax.scan(body, x, jnp.arange(n_stages))
            return jnp.sum(h)
        h = x
        for i in range(n_stages):
            h = stage(h, ks[i % ks.shape[0]], route[i])
        return jnp.sum(h)

    return run


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    C = 128
    D, H, W = 32, 64, 64  # the level-1 win shape family
    x = jax.random.normal(jax.random.key(0), (1, D, H, W, C), jnp.bfloat16)
    ks = jax.random.normal(jax.random.key(1), (8, 3, 3, 3, C, C), jnp.bfloat16) * 0.05

    n = 8
    # isolation sanity
    k0 = ks[0]
    timed(jax.jit(lambda a, b: jnp.sum(xla_conv(a, b))), x, k0, label="isolated conv XLA")
    timed(jax.jit(lambda a, b: jnp.sum(conv3d_3x3_v2(a, b, 8, False))), x, k0, label="isolated conv pallas")

    # H4/H1: chains with k of n routed
    for routed in (0, 1, 2, 4, 8):
        route = [i < routed for i in range(n)]
        run = make_chain(n, route)
        timed(run, x, ks, label=f"chain n={n} routed={routed} (unrolled)")

    # H3: scan chains, all-XLA vs all-pallas
    for r in (False, True):
        run = make_chain(n, [r] * n, scan=True)
        timed(run, x, ks, label=f"chain n={n} routed={'all' if r else 'none'} (scan)")

    # H1 mitigation: fused SiLU epilogue inside the kernel
    @jax.jit
    def fused_epilogue_chain(x, ks):
        h = x
        for i in range(n):
            h = h + conv3d_3x3_v2(gn_silu(h), ks[i], 8, False)
        return jnp.sum(h)

    timed(fused_epilogue_chain, x, ks, label="chain n=8 all-pallas (unrolled)")


if __name__ == "__main__":
    main()
