"""Attention ops: XLA reference path + Pallas flash-kernel dispatch.

The reference computes attention as two einsums with an fp32 softmax
(unet_openai/unet.py:334-395, ldm attention.py).  Here the public entry
points take fused QKV (self) or separate Q/KV (cross) in channels-last
sequence layout (B, T, C) and dispatch either to a plain XLA
implementation (always available, used on CPU/tests) or to the Pallas
flash attention kernel (ops/pallas/flash_attention.py) on TPU.

Softmax accumulation is always float32; the q·k scale is applied to both
operands as 1/sqrt(sqrt(d)) for bf16 stability, matching the reference's
trick (unet.py:354).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["multi_head_self_attention", "multi_head_cross_attention", "use_flash_attention"]

_FLASH_ENABLED = True
_FLASH_MIN_SEQ = 512  # below this, plain XLA is faster than kernel launch overhead


def use_flash_attention(enabled: bool) -> None:
    global _FLASH_ENABLED
    _FLASH_ENABLED = enabled


def _split_heads(x: jnp.ndarray, heads: int) -> jnp.ndarray:
    b, t, c = x.shape
    return x.reshape(b, t, heads, c // heads).transpose(0, 2, 1, 3)  # (B, H, T, D)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(B, H, Tq, D) x (B, H, Tk, D) -> (B, H, Tq, D), fp32 softmax."""
    scale = 1.0 / math.sqrt(math.sqrt(q.shape[-1]))
    logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v)


def _flash_available() -> bool:
    return _FLASH_ENABLED and jax.default_backend() == "tpu"


_warned_fallback = False


def _attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    if _flash_available() and q.shape[2] >= _FLASH_MIN_SEQ:
        try:
            from .pallas.flash_attention import flash_attention

            return flash_attention(q, k, v)
        except ValueError:  # the kernel's own shape/dtype rejection only —
            # anything else (pallas API change, kernel bug) must SURFACE, not
            # silently degrade every site to O(T²) logits (multi-GB at the
            # 3D mid-block) that shows up as an unrelated OOM
            global _warned_fallback
            if not _warned_fallback:
                _warned_fallback = True
                print("WARNING: flash attention rejected these shapes — "
                      "falling back to XLA O(T²) attention")
            return _xla_attention(q, k, v)
    return _xla_attention(q, k, v)


def multi_head_self_attention(qkv: jnp.ndarray, heads: int) -> jnp.ndarray:
    """qkv: (B, T, 3C) fused projection -> (B, T, C)."""
    q, k, v = jnp.split(qkv, 3, axis=-1)
    out = _attention(_split_heads(q, heads), _split_heads(k, heads), _split_heads(v, heads))
    return _merge_heads(out)


def multi_head_cross_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, heads: int
) -> jnp.ndarray:
    """q: (B, Tq, C); k/v: (B, Tk, C) -> (B, Tq, C)."""
    out = _attention(_split_heads(q, heads), _split_heads(k, heads), _split_heads(v, heads))
    return _merge_heads(out)
