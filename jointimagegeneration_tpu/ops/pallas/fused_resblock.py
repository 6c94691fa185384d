"""Fused ResBlock convs: im2col 3x3x3 conv with bias/residual/stats epilogue
(+ optional in-kernel GN-affine+SiLU prologue), one Pallas call per conv.

Round-1 finding (ops/pallas/conv3d.py STATUS, BENCH_NOTES "Known headroom
#1"): XLA's conv3d runs the stage-1 level-0 (Cin=Cout=64) convs at ~36
TF/s because its per-tap contraction underfills the 128-deep MXU K
dimension; an im2col patch matmul (K = 27·Cin) runs the same contraction
near the N=64 ceiling.  The round-1 per-conv routing lost the isolation
win to custom-call boundaries, so here each boundary carries half a
ResBlock (reference block body, unet_openai/unet.py:188-262):

  * the conv accumulates in fp32 and fuses the +bias (conv bias + timestep
    emb), +residual (skip) adds, and the per-channel [sum, sumsq] moments
    of its own output — so the following GroupNorm needs NO extra pass
    over the volume (GN with known moments is a per-channel affine);
  * patch assembly is split per dz tap-plane into two alternating VMEM
    buffers, so the VPU's im2col copies for plane k+1 can overlap the
    MXU's K=9·Cin matmul for plane k;
  * two prologue options: `fused_conv3d` takes a pre-activated input
    (silu(GN(x)) stays an XLA fusion — bandwidth-bound and nearly free
    there) while `fused_affine_silu_conv3d` applies the folded GN affine
    + SiLU inside the kernel (re-zeroing pad taps with iota masks, since
    silu(affine(0)) != 0).

Training: custom VJPs recompute through the identical XLA composition
(same math as differentiating the reference block).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_conv3d",
    "fused_affine_silu_conv3d",
    "gn_affine_from_moments",
    "group_moments",
    "moments_from_channel_sums",
]

# test hook: route through the (interpreted) pallas path even off-TPU
_FORCE_PALLAS = [False]


def _kernel(*refs, th: int, w_out: int, cin: int, cout: int, d: int, h: int,
            has_affine: bool, has_bias: bool, has_residual: bool, want_stats: bool):
    i = 0
    x_refs = refs[i:i + 3]; i += 3
    w_ref = refs[i]; i += 1
    if has_affine:
        sc_ref = refs[i]; sh_ref = refs[i + 1]; i += 2
    bi_ref = refs[i] if has_bias else None
    i += int(has_bias)
    res_ref = refs[i] if has_residual else None
    i += int(has_residual)
    o_ref = refs[i]; i += 1
    st_ref = refs[i] if want_stats else None
    i += int(want_stats)
    patches = (refs[i], refs[i + 1]); i += 2
    acc_ref = refs[i]; i += 1
    stacc_ref = refs[i] if want_stats else None

    zi = pl.program_id(0)
    yi = pl.program_id(1)
    y0 = yi * th
    ny = pl.num_programs(1)

    if has_affine:
        scale = sc_ref[0, :].astype(jnp.float32)  # (Cin,)
        shift = sh_ref[0, :].astype(jnp.float32)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (th, w_out + 2), 1)
        x_ok = (col_ids >= 1) & (col_ids <= w_out)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (th, w_out + 2), 0)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dz in range(3):
        pr = patches[dz % 2]
        for dy in range(3):
            rows = x_refs[dz][0, pl.ds(y0 + dy, th), :, :]  # (TH, W+2, Cin)
            if has_affine:
                t = rows.astype(jnp.float32) * scale + shift
                t = t * jax.nn.sigmoid(t)
                # padded z plane zi+dz / row y0+dy+i / col j are pad unless
                # 1 <= idx <= extent; the mask goes through fp32 before the
                # minor-dim insert (Mosaic restriction for i1/bf16)
                z_ok = jnp.logical_and(zi + dz >= 1, zi + dz <= d)
                r = row_ids + (y0 + dy)
                ok = (x_ok & (r >= 1) & (r <= h) & z_ok).astype(jnp.float32)
                t = (t * ok[:, :, None]).astype(pr.dtype)
            else:
                t = rows
            for dx in range(3):
                col = (dy * 3 + dx) * cin
                pr[:, col:col + cin] = t[:, dx:dx + w_out, :].reshape(th * w_out, cin)
        acc_ref[:] += jnp.dot(pr[:], w_ref[pl.ds(dz * 9 * cin, 9 * cin), :],
                              preferred_element_type=jnp.float32)

    acc = acc_ref[:]
    if has_bias:
        acc = acc + bi_ref[0, :].astype(jnp.float32)
    if has_residual:
        acc = acc + res_ref[0].reshape(th * w_out, cout).astype(jnp.float32)
    o_ref[0] = acc.reshape(th, w_out, cout).astype(o_ref.dtype)

    if want_stats:
        @pl.when(jnp.logical_and(zi == 0, yi == 0))
        def _init():
            stacc_ref[:] = jnp.zeros_like(stacc_ref)

        stacc_ref[0, :] += jnp.sum(acc, axis=0)
        stacc_ref[1, :] += jnp.sum(acc * acc, axis=0)

        @pl.when(jnp.logical_and(zi == d - 1, yi == ny - 1))
        def _emit():
            st_ref[:] = stacc_ref[0:2, :]


def _impl(x, kernel, scale, shift, bias, residual, want_stats, tile_h, vmem_limit_mb,
          has_affine):
    b, d, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert b == 1 and kernel.shape[:4] == (3, 3, 3, cin), (x.shape, kernel.shape)
    assert h % tile_h == 0, (h, tile_h)
    if jax.default_backend() not in ("tpu",) and not _FORCE_PALLAS[0]:
        # CPU path: interpret-mode pallas is ~100x slower than XLA here and
        # the math is identical by the unit tests; keep the suite fast.
        return _xla_reference(x, kernel, scale, shift, bias, residual, want_stats,
                              activate=has_affine)

    xp = jnp.pad(x[0], ((1, 1), (1, 1), (1, 1), (0, 0)))  # (D+2, H+2, W+2, Cin)
    wk = kernel.reshape(27 * cin, cout).astype(x.dtype)

    slice_spec = lambda off: pl.BlockSpec(
        (1, h + 2, w + 2, cin), lambda zi, yi, off=off: (zi + off, 0, 0, 0),
        memory_space=pltpu.VMEM)
    in_specs = [slice_spec(0), slice_spec(1), slice_spec(2),
                pl.BlockSpec(memory_space=pltpu.VMEM)]                    # w
    args = [xp, xp, xp, wk]
    if has_affine:
        in_specs += [pl.BlockSpec((1, cin), lambda zi, yi: (0, 0), memory_space=pltpu.VMEM)] * 2
        args += [scale.reshape(1, cin).astype(jnp.float32),
                 shift.reshape(1, cin).astype(jnp.float32)]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, cout), lambda zi, yi: (0, 0), memory_space=pltpu.VMEM))
        args.append(bias.reshape(1, cout).astype(jnp.float32))
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, tile_h, w, cout), lambda zi, yi: (zi, yi, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(residual[0] if residual.ndim == 5 else residual)

    out_shape = [jax.ShapeDtypeStruct((d, h, w, cout), x.dtype)]
    out_specs = [pl.BlockSpec((1, tile_h, w, cout), lambda zi, yi: (zi, yi, 0, 0),
                              memory_space=pltpu.VMEM)]
    if want_stats:
        out_shape.append(jax.ShapeDtypeStruct((2, cout), jnp.float32))
        out_specs.append(pl.BlockSpec((2, cout), lambda zi, yi: (0, 0), memory_space=pltpu.VMEM))

    scratch = [pltpu.VMEM((tile_h * w, 9 * cin), x.dtype),   # patch plane A
               pltpu.VMEM((tile_h * w, 9 * cin), x.dtype),   # patch plane B
               pltpu.VMEM((tile_h * w, cout), jnp.float32)]
    if want_stats:
        scratch.append(pltpu.VMEM((8, cout), jnp.float32))

    res = pl.pallas_call(
        functools.partial(_kernel, th=tile_h, w_out=w, cin=cin, cout=cout, d=d, h=h,
                          has_affine=has_affine, has_bias=bias is not None,
                          has_residual=residual is not None, want_stats=want_stats),
        grid=(d, h // tile_h),
        in_specs=in_specs,
        out_specs=out_specs if want_stats else out_specs[0],
        out_shape=out_shape if want_stats else out_shape[0],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_mb * 2**20),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    if want_stats:
        return res[0][None], res[1]
    return res[None]


def _xla_reference(x, kernel, scale, shift, bias, residual, want_stats, activate=True):
    """Same math in plain XLA (backward recompute + CPU/test path)."""
    if activate:
        t = x.astype(jnp.float32) * scale + shift
        t = (t * jax.nn.sigmoid(t)).astype(x.dtype)
    else:
        t = x
    y = jax.lax.conv_general_dilated(
        t, kernel.astype(t.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    out = y.astype(x.dtype)
    if want_stats:
        stats = jnp.stack([jnp.sum(y, axis=(0, 1, 2, 3)), jnp.sum(y * y, axis=(0, 1, 2, 3))])
        return out, stats
    return out


# --- mode A: in-kernel GN-affine + SiLU prologue ------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_affine_silu_conv3d(
    x: jnp.ndarray,            # (1, D, H, W, Cin)
    kernel: jnp.ndarray,       # (3, 3, 3, Cin, Cout)
    scale: jnp.ndarray,        # (Cin,) fp32 — folded GN scale
    shift: jnp.ndarray,        # (Cin,) fp32 — folded GN shift
    bias: Optional[jnp.ndarray],      # (Cout,) fp32 or None
    residual: Optional[jnp.ndarray],  # (1, D, H, W, Cout) or None
    want_stats: bool = False,
    tile_h: int = 8,
    vmem_limit_mb: int = 100,
):
    """conv3x3x3(silu(x*scale+shift)) [+bias] [+residual], channels-last.

    Returns the output, plus (2, Cout) fp32 [sum, sumsq] over all voxels of
    the fp32 accumulator when `want_stats` (feeds the next GroupNorm)."""
    return _impl(x, kernel, scale, shift, bias, residual, want_stats, tile_h,
                 vmem_limit_mb, has_affine=True)


def _fwd_a(x, kernel, scale, shift, bias, residual, want_stats, tile_h, vmem_limit_mb):
    out = fused_affine_silu_conv3d(x, kernel, scale, shift, bias, residual,
                                   want_stats, tile_h, vmem_limit_mb)
    return out, (x, kernel, scale, shift, bias, residual)


def _bwd_a(want_stats, tile_h, vmem_limit_mb, saved, g):
    x, kernel, scale, shift, bias, residual = saved
    has_bias = bias is not None
    has_res = residual is not None

    def ref(x, kernel, scale, shift, bias, residual):
        return _xla_reference(x, kernel, scale, shift,
                              bias if has_bias else None,
                              residual if has_res else None, want_stats)

    zeros = jnp.zeros((), jnp.float32)
    _, vjp = jax.vjp(ref, x, kernel, scale, shift,
                     bias if has_bias else zeros, residual if has_res else zeros)
    dx, dk, dsc, dsh, dbi, dres = vjp(g)
    return dx, dk, dsc, dsh, (dbi if has_bias else None), (dres if has_res else None)


fused_affine_silu_conv3d.defvjp(_fwd_a, _bwd_a)


# --- mode B: pre-activated input (prologue stays an XLA fusion) ---------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_conv3d(
    x: jnp.ndarray,            # (1, D, H, W, Cin) — already activated
    kernel: jnp.ndarray,       # (3, 3, 3, Cin, Cout)
    bias: Optional[jnp.ndarray],
    residual: Optional[jnp.ndarray],
    want_stats: bool = False,
    tile_h: int = 8,
    vmem_limit_mb: int = 100,
):
    """conv3x3x3(x) [+bias] [+residual] with fp32 accumulation and optional
    per-channel moments of the output."""
    return _impl(x, kernel, None, None, bias, residual, want_stats, tile_h,
                 vmem_limit_mb, has_affine=False)


def _fwd_b(x, kernel, bias, residual, want_stats, tile_h, vmem_limit_mb):
    out = fused_conv3d(x, kernel, bias, residual, want_stats, tile_h, vmem_limit_mb)
    return out, (x, kernel, bias, residual)


def _bwd_b(want_stats, tile_h, vmem_limit_mb, saved, g):
    x, kernel, bias, residual = saved
    has_bias = bias is not None
    has_res = residual is not None

    def ref(x, kernel, bias, residual):
        return _xla_reference(x, kernel, None, None,
                              bias if has_bias else None,
                              residual if has_res else None, want_stats, activate=False)

    zeros = jnp.zeros((), jnp.float32)
    _, vjp = jax.vjp(ref, x, kernel, bias if has_bias else zeros,
                     residual if has_res else zeros)
    dx, dk, dbi, dres = vjp(g)
    return dx, dk, (dbi if has_bias else None), (dres if has_res else None)


fused_conv3d.defvjp(_fwd_b, _bwd_b)


# --- GroupNorm <-> affine algebra -------------------------------------------

def group_moments(x: jnp.ndarray, num_groups: int):
    """Per-group (mean, var) of (1, *spatial, C) in fp32 — the GN statistics
    (reference GroupNorm32, unet_openai/nn.py:17-19)."""
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(-1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(0, 2))
    var = jnp.maximum(jnp.mean(jnp.square(xf), axis=(0, 2)) - jnp.square(mean), 0.0)
    return mean, var


def moments_from_channel_sums(stats: jnp.ndarray, n_per_channel: int, num_groups: int):
    """Group (mean, var) from the kernel's per-channel [sum, sumsq] (2, C)."""
    c = stats.shape[-1]
    gs = stats.reshape(2, num_groups, c // num_groups).sum(axis=-1)
    n = n_per_channel * (c // num_groups)
    mean = gs[0] / n
    # E[x^2] - mean^2 can cancel slightly NEGATIVE in fp32 when
    # mean^2/var is large (late-UNet residual drift) — the rsqrt in
    # gn_affine_from_moments would then NaN where the two-pass
    # group_norm (blocks.py) is fine; clamp at 0 (the eps still floors it)
    var = jnp.maximum(gs[1] / n - jnp.square(mean), 0.0)
    return mean, var


def gn_affine_from_moments(mean, var, gamma, beta, num_groups: int, eps: float = 1e-5):
    """Fold GN(stats) + per-channel (gamma, beta) into per-channel scale/shift."""
    c = gamma.shape[-1]
    rstd = jax.lax.rsqrt(var + eps)  # (G,)
    per_ch = lambda v: jnp.repeat(v, c // num_groups)
    scale = gamma.astype(jnp.float32) * per_ch(rstd)
    shift = beta.astype(jnp.float32) - per_ch(mean * rstd) * gamma.astype(jnp.float32)
    return scale, shift
