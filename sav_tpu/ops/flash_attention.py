"""Fused blockwise (flash) attention — Pallas TPU kernels with custom VJP.

Replaces the reference's materialized ``[B, h, Lq, Lkv]`` attention tensor
(reference: models/layers/attentions/attention.py:41-58 — O(L^2) HBM traffic
per layer) with an online-softmax kernel: logits never leave VMEM and the
backward pass recomputes probabilities FlashAttention-2 style from saved
logsumexp rows.

Performance-shaping decisions (measured on v5e):
  * All heads are folded into each grid program (a ``fori_loop`` over the
    head axis inside the kernel). A per-(batch, head) grid moved only 32 KB
    per buffer per program — 1536 programs at ~3 us each, 44 GB/s effective
    HBM bandwidth. Folding heads makes every DMA ~12x larger and cuts the
    program count to the batch size.
  * Kernels run on a (batch, q, k) grid over ``[B, h, L, d]`` arrays (one
    fused transpose+pad from the layer library's ``[B, L, h, d]``; Mosaic
    requires the blocked L/d axes to be the two minor ones).
  * head_dim is NOT padded to 128 lanes (d=64 across this zoo); padding
    doubled every operand's footprint and made the kernel path a net loss.
  * Only the sequence axis is padded (to the block size); key-side padding
    is masked with -inf, query-side padding rows are sliced off outside.
  * Row statistics (lse) live in 8-lane HBM arrays; the backward
    delta = rowsum(o * do) is computed in-kernel from the saved output.
  * When the whole kv sequence fits one k block (every ViT/CaiT/TNT-outer
    shape at 224px), the online-softmax carry is skipped entirely — one
    softmax per head, no rescaling, no carry scratch.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
STAT_LANES = 8          # lse lane width in HBM (8 keeps the array small)
STAT_SCRATCH = 128      # m/l carry lane width in VMEM scratch


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _block_sizes(q_len: int, kv_len: int, heads: int, d: int):
    """Pick L-axis block sizes, bounded so head-folded buffers fit VMEM."""
    block_q = min(512, _round_up(q_len, 128))
    block_k = min(1024, _round_up(kv_len, 128))
    # rough VMEM bound: double-buffered q/k/v/out blocks + one f32 s tile
    def footprint(bq, bk):
        blocks = heads * (2 * bq + 2 * bk) * d * 2 * 2
        s_tile = bq * bk * 4
        return blocks + s_tile
    while footprint(block_q, block_k) > 10 * 1024 * 1024 and block_k > 128:
        block_k //= 2
    while footprint(block_q, block_k) > 10 * 1024 * 1024 and block_q > 128:
        block_q //= 2
    return block_q, block_k


def supported(query, key, value, *, bias=None, pre_softmax_transform=None,
              post_softmax_transform=None, dropout_rate=0.0) -> bool:
    """Kernel dispatch predicate (used by sav_tpu.ops.attention).

    Auto mode engages only on TPU; on CPU the kernel would run in the
    (slow) interpreter, so the jnp path wins. Tests force the kernel via
    ``use_kernel=True``.
    """
    if jax.default_backend() != 'tpu':
        return False
    return shape_supported(
        query, key, value, bias=bias,
        pre_softmax_transform=pre_softmax_transform,
        post_softmax_transform=post_softmax_transform,
        dropout_rate=dropout_rate)


def shape_supported(query, key, value, *, bias=None,
                    pre_softmax_transform=None, post_softmax_transform=None,
                    dropout_rate=0.0) -> bool:
    """Backend-independent part of the dispatch predicate."""
    if pre_softmax_transform is not None or post_softmax_transform is not None:
        return False           # talking heads: jnp path (CaiT) for now
    if bias is not None:
        return False           # rel-pos bias: jnp path (BoTNet) for now
    if dropout_rate > 0.0:
        return False
    if query.ndim != 4 or key.ndim != 4:
        return False
    q_len, heads, head_dim = query.shape[-3], query.shape[-2], query.shape[-1]
    if head_dim % 8 != 0 or head_dim > 256:
        return False
    if q_len < 64:             # 1-query class attention etc: jnp is better
        return False
    if query.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return True


def _mask_padding(s, ki, block_k, kv_len):
    """-inf on key columns beyond the true sequence length (static check)."""
    if kv_len % block_k != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + ki * block_k
        s = jnp.where(col < kv_len, s, NEG_INF)
    return s


def _qk(q, k):
    return jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _matmul(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _matmul_tn(a, b):
    """a^T @ b with f32 accumulation."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, out_ref, lse_ref, acc_ref, m_ref,
                l_ref, *, kv_len: int, block_k: int, heads: int):
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)
    single = num_k == 1

    if not single:
        @pl.when(ki == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)

    def per_head(h, carry):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = _mask_padding(_qk(q, k), ki, block_k, kv_len)

        if single:
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            out_ref[0, h] = (_matmul(p.astype(v.dtype), v)
                             / l).astype(out_ref.dtype)
            lse_ref[0, h] = jnp.broadcast_to(m + jnp.log(l),
                                             lse_ref.shape[2:])
            return carry

        m_prev = m_ref[h, :, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)

        l_new = alpha * l_ref[h, :, :1] + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[h] = acc_ref[h] * alpha + _matmul(p.astype(v.dtype), v)
        m_ref[h] = jnp.broadcast_to(m_new, m_ref.shape[1:])
        l_ref[h] = jnp.broadcast_to(l_new, l_ref.shape[1:])

        @pl.when(ki == num_k - 1)
        def _finalize():
            l = l_ref[h, :, :1]
            out_ref[0, h] = (acc_ref[h] / l).astype(out_ref.dtype)
            lse_ref[0, h] = jnp.broadcast_to(
                m_new + jnp.log(jnp.maximum(l, 1e-37)), lse_ref.shape[2:])

        return carry

    if heads <= 16:
        for h in range(heads):   # unrolled: independent chains pipeline
            per_head(h, 0)
    else:
        jax.lax.fori_loop(0, heads, per_head, 0)


def _specs(block_q, block_k, heads, d, swap_qk_grid=False):
    if swap_qk_grid:      # grid is (b, ki, qi)
        qi_of = lambda b, x, y: (b, 0, y, 0)
        ki_of = lambda b, x, y: (b, 0, x, 0)
    else:                 # grid is (b, qi, ki)
        qi_of = lambda b, x, y: (b, 0, x, 0)
        ki_of = lambda b, x, y: (b, 0, y, 0)
    q_spec = pl.BlockSpec((1, heads, block_q, d), qi_of,
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, heads, block_k, d), ki_of,
                           memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, heads, block_q, STAT_LANES), qi_of,
                            memory_space=pltpu.VMEM)
    return q_spec, kv_spec, lse_spec


def _fwd(q, k, v, *, block_q: int, block_k: int, kv_len: int):
    """q/k/v: [B, H, L_pad, d] (q pre-scaled). Returns (out, lse)."""
    batch, heads, q_len_pad, d = q.shape
    kv_len_pad = k.shape[2]
    grid = (batch, q_len_pad // block_q, kv_len_pad // block_k)
    multi = kv_len_pad // block_k > 1

    q_spec, kv_spec, lse_spec = _specs(block_q, block_k, heads, d)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, kv_len=kv_len, block_k=block_k,
                          heads=heads),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=[q_spec, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((batch, heads, q_len_pad, STAT_LANES),
                                 jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((heads, block_q, d) if multi else (1, 8, 128),
                       jnp.float32),
            pltpu.VMEM((heads, block_q, STAT_SCRATCH) if multi
                       else (1, 8, 128), jnp.float32),
            pltpu.VMEM((heads, block_q, STAT_SCRATCH) if multi
                       else (1, 8, 128), jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _dq_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dq_ref,
               acc_ref, *, kv_len: int, block_k: int, heads: int):
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)
    single = num_k == 1

    if not single:
        @pl.when(ki == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

    def per_head(h, carry):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        o = o_ref[0, h].astype(jnp.float32)
        do = do_ref[0, h].astype(jnp.float32)
        lse = lse_ref[0, h][:, :1]
        delta = jnp.sum(o * do, axis=-1, keepdims=True)

        s = _mask_padding(_qk(q, k), ki, block_k, kv_len)
        p = jnp.exp(s - lse)
        dp = _qk(do.astype(v.dtype), v)
        ds = (p * (dp - delta)).astype(k.dtype)

        if single:
            dq_ref[0, h] = _matmul(ds, k).astype(dq_ref.dtype)
        else:
            acc_ref[h] += _matmul(ds, k)

            @pl.when(ki == num_k - 1)
            def _finalize():
                dq_ref[0, h] = acc_ref[h].astype(dq_ref.dtype)
        return carry

    if heads <= 16:
        for h in range(heads):   # unrolled: independent chains pipeline
            per_head(h, 0)
    else:
        jax.lax.fori_loop(0, heads, per_head, 0)


def _dkv_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dk_ref,
                dv_ref, dk_acc, dv_acc, *, kv_len: int, block_k: int,
                heads: int):
    qi = pl.program_id(2)
    num_q = pl.num_programs(2)
    single = num_q == 1
    ki = pl.program_id(1)

    if not single:
        @pl.when(qi == 0)
        def _init():
            dk_acc[:] = jnp.zeros_like(dk_acc)
            dv_acc[:] = jnp.zeros_like(dv_acc)

    def per_head(h, carry):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        o = o_ref[0, h].astype(jnp.float32)
        do = do_ref[0, h].astype(jnp.float32)
        lse = lse_ref[0, h][:, :1]
        delta = jnp.sum(o * do, axis=-1, keepdims=True)

        s = _mask_padding(_qk(q, k), ki, block_k, kv_len)
        p = jnp.exp(s - lse)

        dob = do.astype(v.dtype)
        dv_new = _matmul_tn(p.astype(dob.dtype), dob)
        dp = _qk(dob, v)
        ds = (p * (dp - delta)).astype(q.dtype)
        dk_new = _matmul_tn(ds, q)

        if single:
            dk_ref[0, h] = dk_new.astype(dk_ref.dtype)
            dv_ref[0, h] = dv_new.astype(dv_ref.dtype)
        else:
            dk_acc[h] += dk_new
            dv_acc[h] += dv_new

            @pl.when(qi == num_q - 1)
            def _finalize():
                dk_ref[0, h] = dk_acc[h].astype(dk_ref.dtype)
                dv_ref[0, h] = dv_acc[h].astype(dv_ref.dtype)
        return carry

    if heads <= 16:
        for h in range(heads):   # unrolled: independent chains pipeline
            per_head(h, 0)
    else:
        jax.lax.fori_loop(0, heads, per_head, 0)


def _bwd(q, k, v, out, lse, do, *, block_q: int, block_k: int, kv_len: int):
    batch, heads, q_len_pad, d = q.shape
    kv_len_pad = k.shape[2]
    num_q = q_len_pad // block_q
    num_k = kv_len_pad // block_k

    q_spec, kv_spec, lse_spec = _specs(block_q, block_k, heads, d)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, kv_len=kv_len, block_k=block_k,
                          heads=heads),
        grid=(batch, num_q, num_k),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, q_spec, lse_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[
            pltpu.VMEM((heads, block_q, d) if num_k > 1 else (1, 8, 128),
                       jnp.float32)],
        interpret=_interpret(),
    )(q, k, v, out, do, lse)

    # dk/dv: queries iterate innermost for each key block
    q_spec2, kv_spec2, lse_spec2 = _specs(block_q, block_k, heads, d,
                                          swap_qk_grid=True)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, kv_len=kv_len, block_k=block_k,
                          heads=heads),
        grid=(batch, num_k, num_q),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, q_spec2, lse_spec2],
        out_specs=[kv_spec2, kv_spec2],
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        scratch_shapes=[
            pltpu.VMEM((heads, block_k, d) if num_q > 1 else (1, 8, 128),
                       jnp.float32),
            pltpu.VMEM((heads, block_k, d) if num_q > 1 else (1, 8, 128),
                       jnp.float32)],
        interpret=_interpret(),
    )(q, k, v, out, do, lse)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Custom-VJP wrapper over the padded [B, H, L_pad, d] layout
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
    if q.shape[2] != q_len:
        row = jnp.arange(q.shape[2])[None, None, :, None]
        do = jnp.where(row < q_len, do, 0)
    dq, dk, dv = _bwd(q, k, v, out, lse, do, block_q=block_q,
                      block_k=block_k, kv_len=kv_len)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def mha(query, key, value, *, bias: Optional[jax.Array] = None,
        pre_softmax_transform=None, post_softmax_transform=None):
    """Fused attention on ``[B, L, heads, d]`` (query pre-scaled).

    Returns ``[B, Lq, heads, d]``, matching the jnp path in
    ``sav_tpu.ops.attention.multi_head_attention``.
    """
    assert bias is None and pre_softmax_transform is None \
        and post_softmax_transform is None, 'unsupported in kernel path'

    q_len, heads, d = query.shape[-3], query.shape[-2], query.shape[-1]
    kv_len = key.shape[-3]
    block_q, block_k = _block_sizes(q_len, kv_len, heads, d)
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_k)

    # [B, L, h, d] -> [B, h, L, d]: heads leave the tiled minor dims so
    # blocks can select the full head stack; XLA fuses this with the pad.
    query = jnp.moveaxis(query, -2, -3)
    key = jnp.moveaxis(key, -2, -3)
    value = jnp.moveaxis(value, -2, -3)

    if q_pad != q_len:
        query = jnp.pad(query, ((0, 0), (0, 0), (0, q_pad - q_len), (0, 0)))
    if kv_pad != kv_len:
        pad = ((0, 0), (0, 0), (0, kv_pad - kv_len), (0, 0))
        key = jnp.pad(key, pad)
        value = jnp.pad(value, pad)

    out = _flash(query, key, value, block_q, block_k, q_len, kv_len)
    return jnp.moveaxis(out[:, :, :q_len], -3, -2)
