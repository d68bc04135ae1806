"""Experimental int8 matmul path (AQT-style dynamic quantization).

v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS) — the main
remaining throughput lever once a bf16 train step sits at ~50% MFU
(docs/PERFORMANCE.md). This module provides the building blocks:

  * symmetric per-row/per-column dynamic quantization,
  * ``int8_matmul`` — int8 x int8 -> int32 accumulation, rescaled to f32,
  * ``quantized_dense`` — a drop-in dense forward with a straight-through
    estimator backward (gradients computed as if the matmul were f32).

Not yet wired into the model zoo: quantized *training* needs accuracy
validation first (docs/ROADMAP.md). Opt-in via direct use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_symmetric(x: jax.Array, axis: int):
    """Per-slice symmetric int8 quantization along ``axis``'s complement.

    Returns (int8 values, f32 scale broadcastable against x). Quantization
    math stays in x's dtype (bf16 mantissa suffices for int8 targets) to
    avoid f32 transients of activation-sized arrays.
    """
    absmax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scale = jnp.maximum(absmax, jnp.asarray(1e-8, x.dtype)) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def int8_matmul_raw(a: jax.Array, b: jax.Array) -> jax.Array:
    """f32-ish matmul computed via dynamic int8: a [M, K] @ b [K, N]."""
    qa, sa = quantize_symmetric(a, axis=1)   # per-row
    qb, sb = quantize_symmetric(b, axis=0)   # per-col
    acc = jax.lax.dot_general(qa, qb, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sa * sb


@jax.custom_vjp
def int8_matmul(a, b):
    """int8 forward, straight-through f32 backward."""
    return int8_matmul_raw(a, b)


def _int8_matmul_fwd(a, b):
    return int8_matmul_raw(a, b), (a, b)


def _int8_matmul_bwd(residuals, g):
    a, b = residuals
    ga = jax.lax.dot_general(g, b, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    gb = jax.lax.dot_general(a, g, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return ga.astype(a.dtype), gb.astype(b.dtype)


int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


def quantized_dense(x: jax.Array, kernel: jax.Array, bias=None) -> jax.Array:
    """Dense layer forward through the int8 path; x [..., K], kernel [K, N]."""
    flat = x.reshape(-1, x.shape[-1])
    out = int8_matmul(flat, kernel)
    out = out.reshape(*x.shape[:-1], kernel.shape[-1])
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
