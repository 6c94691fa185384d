"""Fused ResBlock conv: affine+SiLU prologue -> im2col 3x3x3 conv -> bias/
residual/stats epilogue, one Pallas call per conv.

Round-1 finding (ops/pallas/conv3d.py STATUS, BENCH_NOTES "Known headroom
#1"): the isolated im2col conv beats XLA 1.3-1.5x but a bare conv custom
call inside the big UNet program loses 2x to the tpu_custom_call boundary.
Round-2 direction executed here: make each boundary carry a whole half-
ResBlock so the count drops ~54 -> ~27 and the work per call grows from
one conv to norm+act+conv+epilogue (the reference ResBlock body,
ccdm/ddpm/models/unet_openai/unet.py:188-262).

Key algebraic move: GroupNorm with known statistics is a per-CHANNEL
affine y = x*scale_c + shift_c (scale_c = gamma_c * rstd(group(c)),
shift_c = beta_c - mean(group(c)) * scale_c).  The statistics come either
from a cheap XLA reduction over x (GN1) or from the per-channel sum/sumsq
the PREVIOUS fused call accumulated while writing its output (GN2) — so
the normalise+SiLU never makes a separate HBM round trip.

Boundary handling: the input is zero-padded by 1 in XLA, but silu(affine(0))
is nonzero, so the kernel re-zeroes pad taps with (static x, iota y,
scalar z) masks — equivalent to the reference's pad-after-activation
'SAME' conv.

Training: custom VJP recomputes through the identical XLA composition
(same math as differentiating the reference block).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_affine_silu_conv3d", "gn_affine_from_moments", "group_moments", "moments_from_channel_sums"]


def _kernel(*refs, th: int, w_out: int, cin: int, cout: int, d: int, h: int,
            has_bias: bool, has_residual: bool, want_stats: bool, split_k: int):
    # refs layout: x0, x1, x2, w, scale, shift, [bias], [residual], out,
    #              [stats_out], patch_scratch, acc_scratch, [stats_scratch]
    i = 0
    x_refs = refs[i:i + 3]; i += 3
    w_ref = refs[i]; i += 1
    sc_ref = refs[i]; i += 1
    sh_ref = refs[i]; i += 1
    bi_ref = refs[i] if has_bias else None
    i += int(has_bias)
    res_ref = refs[i] if has_residual else None
    i += int(has_residual)
    o_ref = refs[i]; i += 1
    st_ref = refs[i] if want_stats else None
    i += int(want_stats)
    patch_ref = refs[i]; i += 1
    acc_ref = refs[i]; i += 1
    stacc_ref = refs[i] if want_stats else None

    zi = pl.program_id(0)
    yi = pl.program_id(1)
    y0 = yi * th
    ny = pl.num_programs(1)

    scale = sc_ref[0, :].astype(jnp.float32)  # (Cin,)
    shift = sh_ref[0, :].astype(jnp.float32)

    # static x-validity over padded columns 0..W+1 (cols 1..W are real)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (th, w_out + 2), 1)
    x_ok = (col_ids >= 1) & (col_ids <= w_out)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (th, w_out + 2), 0)

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dz in range(3):
        # padded z slice index zi+dz is a pad plane iff 0 or D+1
        z_ok = jnp.logical_and(zi + dz >= 1, zi + dz <= d)
        for dy in range(3):
            rows = x_refs[dz][0, pl.ds(y0 + dy, th), :, :]  # (TH, W+2, Cin)
            t = rows.astype(jnp.float32) * scale + shift
            t = t * jax.nn.sigmoid(t)
            # padded row r = y0+dy+i is real iff 1 <= r <= H
            r = row_ids + (y0 + dy)
            ok = x_ok & (r >= 1) & (r <= h) & z_ok
            t = jnp.where(ok[:, :, None], t, 0.0).astype(patch_ref.dtype)
            for dx in range(3):
                col = ((dz * 9 if split_k == 1 else 0) + dy * 3 + dx) * cin
                patch_ref[:, col:col + cin] = t[:, dx:dx + w_out, :].reshape(th * w_out, cin)
        if split_k == 3:  # partial dot per dz keeps patch at 9*Cin columns
            acc_ref[:] += jnp.dot(patch_ref[:], w_ref[pl.ds(dz * 9 * cin, 9 * cin), :],
                                  preferred_element_type=jnp.float32)
    if split_k == 1:
        acc_ref[:] = jnp.dot(patch_ref[:], w_ref[:], preferred_element_type=jnp.float32)

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


def _xla_reference(x, kernel, scale, shift, bias, residual, want_stats):
    """Same math in plain XLA (backward recompute + CPU/test path)."""
    t = x.astype(jnp.float32) * scale + shift
    t = (t * jax.nn.sigmoid(t)).astype(x.dtype)
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
    the fp32 accumulator when `want_stats` (feeds the next GroupNorm).
    """
    return _impl(x, kernel, scale, shift, bias, residual, want_stats, tile_h, vmem_limit_mb)


def _impl(x, kernel, scale, shift, bias, residual, want_stats, tile_h, vmem_limit_mb):
    b, d, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert b == 1 and kernel.shape[:4] == (3, 3, 3, cin), (x.shape, kernel.shape)
    assert h % tile_h == 0, (h, tile_h)
    if jax.default_backend() not in ("tpu",) and not _FORCE_PALLAS[0]:
        # CPU path: interpret-mode pallas is ~100x slower than XLA here and
        # the math is identical by the unit tests; keep the suite fast.
        return _xla_reference(x, kernel, scale, shift, bias, residual, want_stats)

    xp = jnp.pad(x[0], ((1, 1), (1, 1), (1, 1), (0, 0)))  # (D+2, H+2, W+2, Cin)
    wk = kernel.reshape(27 * cin, cout).astype(x.dtype)
    sc = scale.reshape(1, cin).astype(jnp.float32)
    sh = shift.reshape(1, cin).astype(jnp.float32)

    # full 27*Cin patch when it fits comfortably; per-dz split otherwise
    split_k = 1 if (tile_h * w * 27 * cin * x.dtype.itemsize) <= 8 * 2**20 else 3
    patch_cols = 27 * cin if split_k == 1 else 9 * cin

    slice_spec = lambda off: pl.BlockSpec(
        (1, h + 2, w + 2, cin), lambda zi, yi, off=off: (zi + off, 0, 0, 0),
        memory_space=pltpu.VMEM)
    in_specs = [slice_spec(0), slice_spec(1), slice_spec(2),
                pl.BlockSpec(memory_space=pltpu.VMEM),                    # w
                pl.BlockSpec((1, cin), lambda zi, yi: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cin), lambda zi, yi: (0, 0), memory_space=pltpu.VMEM)]
    args = [xp, xp, xp, wk, sc, sh]
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

    scratch = [pltpu.VMEM((tile_h * w, patch_cols), x.dtype),
               pltpu.VMEM((tile_h * w, cout), jnp.float32)]
    if want_stats:
        scratch.append(pltpu.VMEM((8, cout), jnp.float32))

    res = pl.pallas_call(
        functools.partial(_kernel, th=tile_h, w_out=w, cin=cin, cout=cout, d=d, h=h,
                          has_bias=bias is not None, has_residual=residual is not None,
                          want_stats=want_stats, split_k=split_k),
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


# test hook: route through the (interpreted) pallas path even off-TPU
_FORCE_PALLAS = [False]


def _fwd(x, kernel, scale, shift, bias, residual, want_stats, tile_h, vmem_limit_mb):
    out = fused_affine_silu_conv3d(x, kernel, scale, shift, bias, residual,
                                   want_stats, tile_h, vmem_limit_mb)
    return out, (x, kernel, scale, shift, bias, residual)


def _bwd(want_stats, tile_h, vmem_limit_mb, saved, g):
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


fused_affine_silu_conv3d.defvjp(_fwd, _bwd)


# --- GroupNorm <-> affine algebra -------------------------------------------

def group_moments(x: jnp.ndarray, num_groups: int):
    """Per-group (mean, var) of (1, *spatial, C) in fp32 — the GN statistics
    (reference GroupNorm32, unet_openai/nn.py:17-19)."""
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(-1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(0, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 2)) - jnp.square(mean)
    return mean, var


def moments_from_channel_sums(stats: jnp.ndarray, n_per_channel: int, num_groups: int):
    """Group (mean, var) from the kernel's per-channel [sum, sumsq] (2, C)."""
    c = stats.shape[-1]
    gs = stats.reshape(2, num_groups, c // num_groups).sum(axis=-1)
    n = n_per_channel * (c // num_groups)
    mean = gs[0] / n
    var = gs[1] / n - jnp.square(mean)
    return mean, var


def gn_affine_from_moments(mean, var, gamma, beta, num_groups: int, eps: float = 1e-5):
    """Fold GN(stats) + per-channel (gamma, beta) into per-channel scale/shift."""
    c = gamma.shape[-1]
    rstd = jax.lax.rsqrt(var + eps)  # (G,)
    per_ch = lambda v: jnp.repeat(v, c // num_groups)
    scale = gamma.astype(jnp.float32) * per_ch(rstd)
    shift = beta.astype(jnp.float32) - per_ch(mean * rstd) * gamma.astype(jnp.float32)
    return scale, shift
