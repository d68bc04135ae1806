"""Fused int8 quantize-matmul — Pallas TPU kernel.

v5e's MXU runs int8 at ~1.7x the measured bf16 rate (269 vs 160 TOPS,
docs/PERFORMANCE.md), but the naive XLA formulation in
``sav_tpu.ops.quantized`` measured *slower* than bf16: dynamic quantization
costs ~5 unfused VPU passes per operand and the custom_vjp boundary blocks
fusion. This kernel removes that overhead by quantizing the activation
tile INSIDE the matmul pipeline: each ``[bm, bk]`` bf16 block is scaled,
rounded and cast in VMEM between the DMA and the MXU issue, so the VPU
quantization work overlaps int8 MXU work instead of serializing with it.

Scheme (standard block-wise symmetric int8):
  * activations: per-(row, k-block) scales computed in-kernel — finer
    granularity than the naive path's per-row scales, so accuracy is equal
    or better;
  * weights: pre-quantized OUTSIDE per column (one cheap pass over a
    static-per-step parameter, amortized by XLA across the step);
  * accumulation: int32 MXU tiles, rescaled to f32 per k-block and summed
    in a VMEM f32 scratch accumulator; weight scales applied once in the
    epilogue.

``int8_dense_fused`` wraps the kernel with the same straight-through
bf16-gradient VJP as ``quantized.int8_matmul`` so it drops into the
quantized FF path. A jnp twin (``blockwise_int8_matmul_reference``)
mirrors the in-kernel math op-for-op for equality testing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sav_tpu.ops.quantized import quantize_symmetric

BLOCK_M = 1024
BLOCK_N = 512
BLOCK_K = 256


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _quantize_tile(a):
    """In-kernel per-row symmetric int8 quantization of one [bm, bk] tile.

    Arithmetic runs in f32 regardless of input dtype: the transient is one
    VMEM tile (not the whole-tensor f32 blowup the unfused path pays), and
    Mosaic has no bf16 round-to-even. The jnp twin below mirrors this
    op-for-op.
    """
    a = a.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(a), axis=1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(a / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _kernel(a_ref, bq_ref, bs_ref, out_ref, acc_ref, *, k_steps):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    aq, scale = _quantize_tile(a_ref[...])
    acc = jax.lax.dot_general(aq, bq_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    acc_ref[...] += acc.astype(jnp.float32) * scale

    @pl.when(pl.program_id(2) == k_steps - 1)
    def _done():
        out_ref[...] = (acc_ref[...] * bs_ref[...]).astype(out_ref.dtype)


def int8_matmul_fused_raw(a: jax.Array, b_q: jax.Array,
                          b_scale: jax.Array) -> jax.Array:
    """a [M, K] (bf16/f32) @ dequant(b_q [K, N] int8, b_scale [1, N] f32).

    Returns [M, N] in a's dtype. Pads every axis to the block grid (zero
    rows quantize to zeros, zero k-padding adds nothing, padded columns are
    sliced off).
    """
    m, k = a.shape
    k2, n = b_q.shape
    assert k == k2 and b_scale.shape == (1, n)
    mp, kp, np_ = (_round_up(m, BLOCK_M), _round_up(k, BLOCK_K),
                   _round_up(n, BLOCK_N))
    a_p = jnp.pad(a, ((0, mp - m), (0, kp - k)))
    bq_p = jnp.pad(b_q, ((0, kp - k), (0, np_ - n)))
    bs_p = jnp.pad(b_scale, ((0, 0), (0, np_ - n)))
    k_steps = kp // BLOCK_K

    out = pl.pallas_call(
        functools.partial(_kernel, k_steps=k_steps),
        grid=(mp // BLOCK_M, np_ // BLOCK_N, k_steps),
        in_specs=[
            pl.BlockSpec((BLOCK_M, BLOCK_K), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_K, BLOCK_N), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_N), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_M, BLOCK_N), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), a.dtype),
        scratch_shapes=[pltpu.VMEM((BLOCK_M, BLOCK_N), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary')),
        interpret=_interpret(),
    )(a_p, bq_p, bs_p)
    return out[:m, :n]


def blockwise_int8_matmul_reference(a, b_q, b_scale):
    """jnp twin of the kernel math (same tile granularity and dtypes)."""
    m, k = a.shape
    kp = _round_up(k, BLOCK_K)
    a_p = jnp.pad(a, ((0, 0), (0, kp - k)))
    bq_p = jnp.pad(b_q, ((0, kp - k), (0, 0)))
    acc = jnp.zeros((m, b_q.shape[1]), jnp.float32)
    for kk in range(kp // BLOCK_K):
        tile = a_p[:, kk * BLOCK_K:(kk + 1) * BLOCK_K]
        aq, scale = _quantize_tile(tile)
        part = jax.lax.dot_general(
            aq, bq_p[kk * BLOCK_K:(kk + 1) * BLOCK_K], (((1,), (0,)),
                                                        ((), ())),
            preferred_element_type=jnp.int32)
        acc = acc + part.astype(jnp.float32) * scale
    return (acc * b_scale).astype(a.dtype)


@jax.custom_vjp
def _int8_dense_core(a, kernel):
    b_q, b_scale = quantize_symmetric(kernel, axis=0)
    return int8_matmul_fused_raw(a, b_q, b_scale)


def _core_fwd(a, kernel):
    return _int8_dense_core(a, kernel), (a, kernel)


def _core_bwd(residuals, g):
    # straight-through estimator: gradients as if the matmul were bf16/f32
    # (same contract as quantized.int8_matmul)
    a, kernel = residuals
    ga = jax.lax.dot_general(g, kernel, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    gk = jax.lax.dot_general(a, g, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return ga.astype(a.dtype), gk.astype(kernel.dtype)


_int8_dense_core.defvjp(_core_fwd, _core_bwd)


def int8_dense_fused(x: jax.Array, kernel: jax.Array, bias=None) -> jax.Array:
    """Dense forward through the fused kernel; x [..., K], kernel [K, N]."""
    flat = x.reshape(-1, x.shape[-1])
    out = _int8_dense_core(flat, kernel.astype(x.dtype))
    out = out.reshape(*x.shape[:-1], kernel.shape[-1])
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
