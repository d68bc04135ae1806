"""Fused blockwise (flash) attention — Pallas TPU kernels with custom VJP.

Replaces the reference's materialized ``[B, h, Lq, Lkv]`` attention tensor
(reference: models/layers/attentions/attention.py:41-58 — O(L^2) HBM traffic
per layer) with an online-softmax kernel: logits never leave VMEM, softmax
statistics are carried in f32 scratch across key blocks, and the backward
pass recomputes probabilities FlashAttention-2 style from saved logsumexp
rows instead of storing them.

Layout: the wrapper takes ``[..., L, heads, d]`` (the layer-library
convention), folds batch*heads into one grid axis, pads L to the block size
and d to the 128-lane width, and unpads on the way out. Key-side padding is
masked with -inf inside the kernel; query-side padding rows are garbage that
gets sliced off.

Grid is (batch*heads, q_blocks, k_blocks) with the k axis innermost: the
accumulator/stat scratch persists across sequential k steps on the same
core, initialized at k==0 and finalized (acc / l, lse written) at the last
k block. Matmuls accumulate in f32 via ``preferred_element_type``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


def _block_sizes(q_len: int, kv_len: int):
    block_q = min(256, max(LANES, _round_up(q_len, LANES)))
    block_k = min(512, max(LANES, _round_up(kv_len, LANES)))
    return block_q, block_k


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def supported(query, key, value, *, bias=None, pre_softmax_transform=None,
              post_softmax_transform=None, dropout_rate=0.0) -> bool:
    """Kernel dispatch predicate (used by sav_tpu.ops.attention).

    Auto mode engages only on TPU; on CPU the kernel would run in the
    (slow) interpreter, so the jnp path wins. Tests force the kernel via
    ``use_kernel=True``.
    """
    if jax.default_backend() != 'tpu':
        return False
    if pre_softmax_transform is not None or post_softmax_transform is not None:
        return False           # talking heads: jnp path (CaiT) for now
    if bias is not None:
        return False           # rel-pos bias: jnp path (BoTNet) for now
    if dropout_rate > 0.0:
        return False
    if query.ndim != 4 or key.ndim != 4:
        return False
    q_len, heads, head_dim = query.shape[-3], query.shape[-2], query.shape[-1]
    if head_dim < 16 or head_dim > 256:
        return False
    if q_len < 64:             # 1-query class attention etc: jnp is better
        return False
    if query.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return True


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, out_ref, lse_ref,
                acc_ref, m_ref, l_ref, *, kv_len: int, block_k: int):
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]                       # [block_q, d]
    k = k_ref[0]                       # [block_k, d]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # [block_q, block_k]

    # mask out key-side padding in the (only possibly ragged) last block
    first_key = ki * block_k
    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + first_key
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_ref[:, :1]                           # [block_q, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)

    l_new = alpha * l_ref[:, :1] + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ki == num_k - 1)
    def _finalize():
        l = l_ref[:, :1]
        out_ref[0] = (acc_ref[:] / l).astype(out_ref.dtype)
        lse_ref[0] = (m_ref[:] + jnp.log(jnp.maximum(l_ref[:], 1e-37)))


def _fwd(q, k, v, *, block_q: int, block_k: int, kv_len: int):
    """q,k,v: [BH, Lq_pad, d_pad] (q pre-scaled). Returns (out, lse)."""
    bh, q_len_pad, d = q.shape
    kv_len_pad = k.shape[1]
    grid = (bh, q_len_pad // block_q, kv_len_pad // block_k)

    kernel = functools.partial(_fwd_kernel, kv_len=kv_len, block_k=block_k)
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, LANES), lambda b, qi, ki: (b, qi, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, q_len_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, q_len_pad, LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
            pltpu.VMEM((block_q, LANES), jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               acc_ref, *, kv_len: int, block_k: int):
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)
    acc_ref[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ki == num_k - 1)
    def _finalize():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, kv_len: int,
                block_k: int):
    qi = pl.program_id(2)
    num_q = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if kv_len % block_k != 0:
        ki = pl.program_id(1)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)
    p = jnp.exp(s - lse)                             # [block_q, block_k]

    dv_acc[:] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [block_k, d]

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta)                            # [block_q, block_k]
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [block_k, d]

    @pl.when(qi == num_q - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd(q, k, v, out, lse, do, *, block_q: int, block_k: int, kv_len: int):
    bh, q_len_pad, d = q.shape
    kv_len_pad = k.shape[1]

    delta = jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32),
                    axis=-1, keepdims=True)              # [BH, Lq, 1]
    delta = jnp.broadcast_to(delta, (bh, q_len_pad, LANES))

    q_spec = pl.BlockSpec((1, block_q, d), lambda b, qi, ki: (b, qi, 0), memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, block_k, d), lambda b, qi, ki: (b, ki, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, block_q, LANES),
                            lambda b, qi, ki: (b, qi, 0),
                            memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, kv_len=kv_len, block_k=block_k),
        grid=(bh, q_len_pad // block_q, kv_len_pad // block_k),
        in_specs=[q_spec, k_spec, k_spec, q_spec, row_spec, row_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)

    # dk/dv: grid loops queries innermost for each key block
    q_spec2 = pl.BlockSpec((1, block_q, d), lambda b, ki, qi: (b, qi, 0), memory_space=pltpu.VMEM)
    k_spec2 = pl.BlockSpec((1, block_k, d), lambda b, ki, qi: (b, ki, 0), memory_space=pltpu.VMEM)
    row_spec2 = pl.BlockSpec((1, block_q, LANES),
                             lambda b, ki, qi: (b, qi, 0),
                             memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, kv_len=kv_len, block_k=block_k),
        grid=(bh, kv_len_pad // block_k, q_len_pad // block_q),
        in_specs=[q_spec2, k_spec2, k_spec2, q_spec2, row_spec2, row_spec2],
        out_specs=[k_spec2, k_spec2],
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Public wrapper (custom VJP over padded [BH, L, d] layout)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, block_q, block_k, q_len, kv_len):
    out, _ = _fwd(q, k, v, block_q=block_q, block_k=block_k, kv_len=kv_len)
    return out


def _flash_fwd(q, k, v, block_q, block_k, q_len, kv_len):
    out, lse = _fwd(q, k, v, block_q=block_q, block_k=block_k, kv_len=kv_len)
    return out, (q, k, v, out, lse)


def _flash_bwd(block_q, block_k, q_len, kv_len, residuals, do):
    q, k, v, out, lse = residuals
    # zero the cotangent on query-padding rows so they don't pollute dk/dv
    if q.shape[1] != q_len:
        row = jnp.arange(q.shape[1])[None, :, None]
        do = jnp.where(row < q_len, do, 0)
    dq, dk, dv = _bwd(q, k, v, out, lse, do, block_q=block_q,
                      block_k=block_k, kv_len=kv_len)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def mha(query, key, value, *, bias: Optional[jax.Array] = None,
        pre_softmax_transform=None, post_softmax_transform=None):
    """Fused attention on ``[..., L, heads, d]`` (query pre-scaled).

    Returns ``[..., Lq, heads, d]``, matching the jnp path in
    ``sav_tpu.ops.attention.multi_head_attention``.
    """
    assert bias is None and pre_softmax_transform is None \
        and post_softmax_transform is None, 'unsupported in kernel path'

    *batch_dims, q_len, heads, head_dim = query.shape
    kv_len = key.shape[-3]

    def fold(x, length):
        x = jnp.moveaxis(x, -2, -3)                 # [..., heads, L, d]
        return x.reshape((-1, length, head_dim))

    q = fold(query, q_len)
    k = fold(key, kv_len)
    v = fold(value, kv_len)

    block_q, block_k = _block_sizes(q_len, kv_len)
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_k)
    d_pad = _round_up(head_dim, LANES)

    q = jnp.pad(q, ((0, 0), (0, q_pad - q_len), (0, d_pad - head_dim)))
    k = jnp.pad(k, ((0, 0), (0, kv_pad - kv_len), (0, d_pad - head_dim)))
    v = jnp.pad(v, ((0, 0), (0, kv_pad - kv_len), (0, d_pad - head_dim)))

    out = _flash(q, k, v, block_q, block_k, q_len, kv_len)
    out = out[:, :q_len, :head_dim]
    out = out.reshape((*batch_dims, heads, q_len, head_dim))
    return jnp.moveaxis(out, -3, -2)
