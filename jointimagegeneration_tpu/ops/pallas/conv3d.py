"""Pallas 3x3x3 convolution (channels-last) with fused SiLU epilogue.

The stage-1 hot op: every ResBlock runs 3^3 convs over (D, H, W, C)
volumes (SURVEY.md §2.4).  The kernel restructures the contraction as one
MXU-friendly matmul per (depth, row-tile) program:

  * the padded input stays in HBM (`pl.ANY`); each program DMAs just
    its (3, TH+2, W+2, C) halo window into VMEM scratch
    (`make_async_copy`) — overlapping windows that BlockSpec tiling can't
    express, and a VMEM footprint independent of H;
  * a (TH*W, 27*C) im2col patch matrix is assembled in VMEM from 27
    static shifted slices, then ONE `jnp.dot` against the (27*C, Cout)
    reshaped kernel runs with fp32 accumulation (K = 27*C fills the MXU
    even at C=64, where XLA's conv3d underutilises);
  * optional fused SiLU epilogue (the conv→SiLU tails of the reference
    ResBlock, unet_openai/unet.py:149-262) with no extra HBM round trip.

Interpret mode runs on CPU for the test suite.

STATUS (measured on v5e): `conv3d_3x3_v2` below compiles and runs
bit-exact on hardware and beats XLA's conv3d 1.3–1.5x in ISOLATION at
Cin>=128 (60 vs 39–58 TF/s at the level-1 shape; parity at Cin=64).
But whole-model routing is >2x SLOWER even when only ONE conv site at
the exact win shape is routed (282 vs 120 ms/denoise-step), while the
same XLA-vs-pallas pair in a small ResBlock-context program differs by
just 7% — the cost is the tpu_custom_call boundary inside a large XLA
module (lost buffer aliasing / scheduling), not the kernel.  So
`UNet(use_pallas_conv=True)` stays OFF by default; the XLA conv path
(~53 TF/s whole-model) is production.  Round-2 direction: investigate
aliasing across pallas_call in large programs, and fuse whole ResBlocks
(GN+SiLU+conv+emb+conv) so boundaries are fewer and heavier.

The first formulation (`conv3d_3x3`, manual halo DMA from HBM) remains
interpret-only: Mosaic rejects its window slices (sublane-unaligned HBM
slices; lane slices of non-128 channel extents; lane-splitting shape
casts).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3d_3x3", "conv3d_3x3_v2"]


def _kernel(x_hbm, w_ref, o_ref, win_ref, patch_ref, sem, *, th: int, w_out: int, w_pad: int,
            cin: int, activate: bool):
    # x_hbm: (D+2, H+2, w_pad*C) — W and C flattened into the lane dim so the
    # halo window DMA slices only the leading (tiling-free) dims
    zi = pl.program_id(0)
    yi = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(zi, 3), pl.ds(yi * th, th + 2), :],
        win_ref,
        sem,
    )
    dma.start()
    dma.wait()

    for dz in range(3):
        for dy in range(3):
            rows = win_ref[dz, dy : dy + th, :].reshape(th, w_pad, cin)
            for dx in range(3):
                col = (dz * 9 + dy * 3 + dx) * cin
                blk = rows[:, dx : dx + w_out, :]
                patch_ref[:, col : col + cin] = blk.reshape(th * w_out, cin)
    acc = jnp.dot(patch_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    if activate:
        acc = acc * jax.nn.sigmoid(acc)
    o_ref[0, :, :, :] = acc.reshape(th, w_out, -1).astype(o_ref.dtype)


def _xla_conv3d(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3d_3x3(
    x: jnp.ndarray,  # (B, D, H, W, Cin)
    kernel: jnp.ndarray,  # (3, 3, 3, Cin, Cout)
    tile_h: int = 8,
    activate: bool = False,
) -> jnp.ndarray:
    """'SAME' 3x3x3 conv (+ optional fused SiLU). Requires H % tile_h == 0.
    Differentiable: backward recomputes through the XLA conv (same math)."""
    return _conv3d_3x3_impl(x, kernel, tile_h, activate)


def _conv3d_fwd(x, kernel, tile_h, activate):
    return conv3d_3x3(x, kernel, tile_h, activate), (x, kernel)


def _conv3d_bwd(tile_h, activate, res, g):
    x, kernel = res

    def ref(x, kernel):
        y = _xla_conv3d(x, kernel)
        return y * jax.nn.sigmoid(y) if activate else y

    _, vjp = jax.vjp(ref, x, kernel)
    return vjp(g)


conv3d_3x3.defvjp(_conv3d_fwd, _conv3d_bwd)


def _conv3d_3x3_impl(x, kernel, tile_h, activate):
    b, d, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert kernel.shape[:4] == (3, 3, 3, cin), kernel.shape
    assert h % tile_h == 0, (h, tile_h)
    if b != 1:
        return jax.vmap(lambda xi: _conv3d_3x3_impl(xi[None], kernel, tile_h, activate)[0])(x)

    # halo pad; W padded so w_pad*C is lane-tile (128) aligned, then W and C
    # flatten into ONE trailing dim — the halo DMA then slices only z/y,
    # which Mosaic allows for any extent
    w_pad = w + 2
    while (w_pad * cin) % 128:
        w_pad += 1
    xp = jnp.pad(x[0], ((1, 1), (1, 1), (1, w_pad - w - 1), (0, 0)))  # (D+2, H+2, w_pad, C)
    xp = xp.reshape(d + 2, h + 2, w_pad * cin)
    wk = kernel.reshape(27 * cin, cout)

    out = pl.pallas_call(
        functools.partial(_kernel, th=tile_h, w_out=w, w_pad=w_pad, cin=cin, activate=activate),
        grid=(d, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # stays in HBM; manual DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, cout), lambda zi, yi: (zi, yi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((3, tile_h + 2, w_pad * cin), x.dtype),
            pltpu.VMEM((tile_h * w, 27 * cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=jax.default_backend() != "tpu",
    )(xp, wk)
    return out[None]


# --- variant 2: BlockSpec-delivered halo (no manual DMA) ---------------------
# Inputs are the depth-padded array passed three times with block index maps
# (zi, zi+1, zi+2) that do NOT depend on the H-tile grid dim, so Mosaic keeps
# the slices resident across row tiles; vmem_limit_bytes lifts the
# conservative scoped-allocation estimate.


def _kernel_v2(x0_ref, x1_ref, x2_ref, w_ref, o_ref, patch_ref, *, th: int, w_out: int,
               cin: int, activate: bool):
    yi = pl.program_id(1)
    y0 = yi * th
    refs = (x0_ref, x1_ref, x2_ref)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                col = (dz * 9 + dy * 3 + dx) * cin
                blk = refs[dz][0, pl.ds(y0 + dy, th), pl.ds(dx, w_out), :]
                patch_ref[:, col : col + cin] = blk.reshape(th * w_out, cin)
    acc = jnp.dot(patch_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    if activate:
        acc = acc * jax.nn.sigmoid(acc)
    o_ref[0, :, :, :] = acc.reshape(th, w_out, -1).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv3d_3x3_v2(x: jnp.ndarray, kernel: jnp.ndarray, tile_h: int = 8,
                  activate: bool = False, vmem_limit_mb: int = 64) -> jnp.ndarray:
    return _conv3d_v2_impl(x, kernel, tile_h, activate, vmem_limit_mb)


def _v2_fwd(x, kernel, tile_h, activate, vmem_limit_mb):
    return conv3d_3x3_v2(x, kernel, tile_h, activate, vmem_limit_mb), (x, kernel)


def _v2_bwd(tile_h, activate, vmem_limit_mb, res, g):
    x, kernel = res

    def ref(x, kernel):
        y = _xla_conv3d(x, kernel)
        return y * jax.nn.sigmoid(y) if activate else y

    _, vjp = jax.vjp(ref, x, kernel)
    return vjp(g)


conv3d_3x3_v2.defvjp(_v2_fwd, _v2_bwd)


def _conv3d_v2_impl(x, kernel, tile_h, activate, vmem_limit_mb=64):
    b, d, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert kernel.shape[:4] == (3, 3, 3, cin) and h % tile_h == 0
    if b != 1:
        return jax.vmap(lambda xi: _conv3d_v2_impl(xi[None], kernel, tile_h, activate, vmem_limit_mb)[0])(x)
    xp = jnp.pad(x[0], ((1, 1), (1, 1), (1, 1), (0, 0)))  # (D+2, H+2, W+2, C)
    wk = kernel.reshape(27 * cin, cout)
    slice_spec = lambda off: pl.BlockSpec(
        (1, h + 2, w + 2, cin), lambda zi, yi, off=off: (zi + off, 0, 0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel_v2, th=tile_h, w_out=w, cin=cin, activate=activate),
        grid=(d, h // tile_h),
        in_specs=[slice_spec(0), slice_spec(1), slice_spec(2), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile_h, w, cout), lambda zi, yi: (zi, yi, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d, h, w, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_h * w, 27 * cin), x.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit_mb * 2**20),
        interpret=jax.default_backend() != "tpu",
    )(xp, xp, xp, wk)
    return out[None]
