"""Pallas TPU flash attention (blockwise online-softmax).

Replaces the reference's materialised T×T attention (two einsums + full
softmax, unet_openai/unet.py:334-395) for the UNet self/cross-attention
sites.  The S=T×T score matrix never leaves VMEM: the kernel streams K/V
blocks per Q block, maintaining the running max/denominator in fp32
scratch — O(T·D) HBM traffic instead of O(T²).

Layout: (BH, T, D) with heads folded into the leading grid dimension
(head dims here are small — 32/64 — so per-(batch·head) programs keep the
MXU fed while the lane dimension carries D).  Softmax statistics are
always fp32 regardless of input dtype.

Grid iteration on TPU is sequential with the last axis fastest, so the
(bh, q_block, k_block) grid accumulates across k_block in VMEM scratch
(@pl.when init at k==0, emit at k==last) — the canonical TPU flash
pattern from the Pallas guide.

Training: `flash_attention` carries a custom VJP whose backward
re-derives gradients from the plain XLA attention (recompute, no
residuals) — numerically identical to differentiating the reference
implementation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref):
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (BQ, D)
    k = k_ref[0]  # (BK, D)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, BK) fp32

    m_prev = m_ref[:, :1]  # (BQ, 1) of the lane-padded (BQ, 128) scratch
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)  # (BQ, BK)
    corr = jnp.exp(m_prev - m_new)  # (BQ, 1)

    l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(k_idx == nk - 1)
    def _emit():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, block_q: int, block_k: int) -> jnp.ndarray:
    """(BH, Tq, D) x (BH, Tk, D) -> (BH, Tq, D); q pre-scaled."""
    bh, tq, d = q.shape
    tk = k.shape[1]
    bq = min(block_q, tq)
    bk = min(block_k, tk)
    grid = (bh, tq // bq, tk // bk)
    # interpret mode lets the CPU test suite exercise the kernel
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        _flash_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, tq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),  # running max, lane-padded
            pltpu.VMEM((bq, 128), jnp.float32),  # running denom, lane-padded
        ],
        interpret=interpret,
    )(q, k, v)


def _xla_attention_4d(q, k, v):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, block_q, block_k):
    b, h, tq, d = q.shape
    out = _flash_forward(
        q.reshape(b * h, tq, d), k.reshape(b * h, -1, d), v.reshape(b * h, -1, d), block_q, block_k
    )
    return out.reshape(b, h, tq, d)


def _flash_fwd(q, k, v, block_q, block_k):
    return _flash(q, k, v, block_q, block_k), (q, k, v)


def _flash_bwd(block_q, block_k, res, g):
    # backward = differentiate the reference XLA attention (recompute)
    q, k, v = res
    _, vjp = jax.vjp(_xla_attention_4d, q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    block_q: int = 512, block_k: int = 512) -> jnp.ndarray:
    """(B, H, Tq, D) attention with softmax over Tk.  Inputs unscaled —
    this applies 1/sqrt(D) to q (equivalent to the reference's
    double 1/sqrt(sqrt(D)) trick, unet.py:354)."""
    d = q.shape[-1]
    q = q * (1.0 / math.sqrt(d))
    bq = min(block_q, q.shape[2])
    bk = min(block_k, k.shape[2])
    if q.shape[2] % bq or k.shape[2] % bk or d > 256:
        raise ValueError(f"flash_attention: unsupported shape q={q.shape} k={k.shape}")
    return _flash(q, k, v, bq, bk)
