"""Fused blockwise (flash) attention — Pallas TPU kernels with custom VJP.

Replaces the reference's materialized ``[B, h, Lq, Lkv]`` attention tensor
(reference: models/layers/attentions/attention.py:41-58 — O(L^2) HBM traffic
per layer) with an online-softmax kernel: logits never leave VMEM and the
backward pass recomputes probabilities FlashAttention-2 style from saved
logsumexp rows.

Performance-shaping decisions (measured on v5e):
  * ZERO-COPY layout: kernels read the layer library's q/k/v directly as
    ``[B, L, heads*d]`` (a free reshape of the projection output) and slice
    each head's 64-lane band in VMEM — no [B,L,h,d]->[B,h,L,d] transpose
    copies on the hot path, no head_dim padding. Only the L axis is padded
    (one fused pad), key-side padding masked with -inf in-kernel.
  * All heads are processed inside each grid program (per-(batch, head)
    grids moved 32 KB per buffer per program and starved HBM).
  * Row statistics (lse) live in 8-lane arrays; backward
    delta = rowsum(o * do) is computed in-kernel from the saved output.
  * Single-block fast paths: when kv fits one key block (every ViT/CaiT/
    TNT-outer shape at 224px) the forward skips the online-softmax carry,
    and the backward fuses dq/dk/dv into ONE kernel that reads q,k,v,o,do
    once and recomputes p once.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
STAT_LANES = 8          # lse lane width in HBM
STAT_SCRATCH = 128      # m/l carry lane width in VMEM scratch
BAND = 64               # head bands must be 64-lane aligned


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


# Per-kernel scoped-VMEM limits. Mosaic's DEFAULT limit is ~16 MB of
# v5e's 128 MB physical VMEM, and round 3 discovered it is adjustable
# per kernel (pltpu.CompilerParams(vmem_limit_bytes=...)). Shapes whose
# single-block footprint exceeds the default-budget search (13 MB) but
# fits _RAISED_CAP run as ONE block per direction with the limit raised:
# at ViT-B @384 (L=577) this measured 11.01 -> 6.72 ms/layer for the
# attention sublayer (benchmarks/vmem384_probe.py — note the fused lane
# there needs the (qp, kp) bwd blocks; a 640 kv block over 592-padded
# arrays makes num_k=0 and silently skips the backward).
_VMEM_LIMIT: int | None = None      # probe override; None = computed
_RAISED_CAP = 40 * 1024 * 1024      # max single-block footprint
_RAISED_LIMIT = 64 * 1024 * 1024    # per-kernel limit in raised regime
_SINGLE_BLOCK_MAX_L = 1024          # raised regime only below this L


def _cparams(heads=None, bq=None, bk=None):
    if _interpret():
        return {}
    limit = _VMEM_LIMIT
    if limit is None and heads is not None:
        # the per-head logits tiles dominate; past ~8 MB of them the
        # 16 MB default is in play, so raise this kernel's cap
        if heads * bq * bk * 4 > 8 * 1024 * 1024:
            limit = _RAISED_LIMIT
    if limit is None:
        return {}
    return dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=limit))


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _block_sizes(q_len: int, kv_len: int, heads: int, d: int):
    """Pick L-axis block sizes, bounded so the head-packed buffers fit
    VMEM.

    Query blocks only need sublane (16) alignment — 197 pads to 208, not
    256, which cuts every matmul's M and the exp count by 1.23x at ViT
    shapes — and are balanced across the block count so e.g. 577 runs as
    2x304, not 2x512 (77% padding). Key blocks stay 128-aligned: kv is the
    lane axis of the logits tile. The footprint model includes the
    multi-kv-block online-softmax scratch (acc/m/l per head), whose
    omission previously overflowed scoped VMEM at L=577.
    """
    def footprint(bq, bk):
        hd = heads * d
        blocks = (2 * bq + 2 * bk) * hd * 2 * 2   # double-buffered bf16
        # Mosaic schedules the unrolled head loop with roughly one live f32
        # logits tile PER HEAD (measured: 448x512 single-block demands
        # ~17 MB, 304x640 ~15 MB, matching heads*bq*bk*4 + blocks)
        s_tiles = heads * bq * bk * 4
        multi = _round_up(kv_len, bk) > bk
        scratch = heads * bq * (d + 2 * STAT_SCRATCH) * 4 if multi else 0
        return blocks + s_tiles + scratch

    # 13 MB of the 16 MB scoped VMEM: standalone, 304x640 (est 15.1 MB)
    # compiles and 208x896 (est 15.7 MB) does not; embedded in a full
    # train-step scan Mosaic's stack runs ~2 MB higher still (304x640
    # fails there at 16.93 MB), so the budget leaves that headroom
    budget = 13 * 1024 * 1024

    # raised regime: when the whole problem fits one block per direction
    # under _RAISED_CAP (with the per-kernel vmem limit lifted via
    # _cparams), prefer that — no online-softmax carry, no q-block
    # revisits of kv. Only engages past the default budget so every
    # previously-chosen (and measured) block layout is unchanged.
    if q_len <= _SINGLE_BLOCK_MAX_L and kv_len <= _SINGLE_BLOCK_MAX_L:
        bq1 = max(_round_up(q_len, 16), 64)
        bk1 = _round_up(kv_len, 128)
        # r5 fix: the BACKWARD must also fit its raised single block at
        # these sizes — at h=16/L=577 (ViT-L @384) the fwd fit (34.3 MB)
        # but the bwd did not (44.3 MB), and the fused core's shared
        # 592-row pad (16*37: no 64-aligned divisor) then drove
        # _bwd_blocks into a non-dividing fallback that silently dropped
        # kv rows (numerics receipt: verify_tpu_numerics rel-max 0.565;
        # the raised fwd kernel also faulted the TPU worker). h<=12
        # shapes are unchanged (ViT-B @384 bwd cost 35.4 MB <= cap).
        if (budget < footprint(bq1, bk1) <= _RAISED_CAP
                and _bwd_cost(bq1, bk1, heads, d) <= _RAISED_CAP):
            return bq1, bk1
    # Preference order: fewest kv blocks first (each extra kv block pays
    # the online-softmax m/l carry over every q row — measured 3x slower
    # than a single-kv-block pass at L=448), then largest q blocks.
    min_nk = -(-kv_len // 1024)
    for n_k in range(min_nk, 64):
        block_k = min(1024, _round_up(-(-kv_len // n_k), 128))
        # q blocks up to 1568 rows: CvT stage-1 (3136x784) measured
        # 1892 -> 1909 img/s end-to-end moving from 7x448 to 2x1568
        # (whole-q 1x3136 overflows the dq kernel's scoped VMEM); shapes
        # <= 512 rows pick exactly what the old 512-row cap picked
        for n_q in range(-(-q_len // 1568), 64):
            block_q = _round_up(-(-q_len // n_q), 16)
            if footprint(block_q, block_k) <= budget:
                return block_q, block_k
    return 128, 128


def supported(query, key, value, *, bias=None, pre_softmax_transform=None,
              post_softmax_transform=None, dropout_rate=0.0) -> bool:
    """Kernel dispatch predicate (used by sav_tpu.ops.attention).

    Auto mode engages only on TPU; on CPU the kernel would run in the
    (slow) interpreter, so the jnp path wins. Tests force the kernel via
    ``use_kernel=True``.
    """
    if jax.default_backend() != 'tpu':
        return False
    if not shape_supported(
            query, key, value, bias=bias,
            pre_softmax_transform=pre_softmax_transform,
            post_softmax_transform=post_softmax_transform,
            dropout_rate=dropout_rate):
        return False
    # Measured dispatch (v5e, round 2). In ISOLATION the kernel beats
    # XLA's fused attention from L~320 up (fwd+bwd: L=320 3.38 vs 4.46,
    # L=448 3.75 vs 5.62, L=577 4.30 vs 6.37, L=785 3.55 vs 5.47 ms;
    # 1.3-1.5x). EMBEDDED in the full train step the custom_vjp boundary
    # costs ~2 ms/layer of lost cross-op fusion (ViT-B @384: kernel-on
    # 207.4 vs kernel-off 185.4 ms/step despite the ~18 ms isolated core
    # saving), which cancels the core win until the attention map gets
    # large. End-to-end the kernel pays off from ~1M logits elements (CvT
    # stage-1, 3136x784: wins with far less live memory); below that XLA
    # keeps the dispatch. Receipts: docs/PERFORMANCE.md round-2 section.
    return query.shape[-3] * key.shape[-3] >= 1_000_000


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
    if head_dim % BAND != 0 or head_dim > 256:
        return False           # head bands must be 64-lane aligned
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


def _band(ref, i, h, d):
    """Head h's 64-aligned lane band of a [1, L, H*d] block."""
    return ref[i, :, h * d:(h + 1) * d]


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, out_ref, lse_ref, acc_ref, m_ref,
                l_ref, *, kv_len: int, block_k: int, heads: int, d: int):
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)
    single = num_k == 1

    if not single:
        @pl.when(ki == 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            l_ref[:] = jnp.zeros_like(l_ref)

    for h in range(heads):
        q = _band(q_ref, 0, h, d)
        k = _band(k_ref, 0, h, d)
        v = _band(v_ref, 0, h, d)

        if single:
            # No -inf masking pass: every consumer of the logits slices to
            # the true kv length, so padding columns never reach the
            # softmax or the PV matmul (their values are irrelevant —
            # Mosaic zero-masks the unaligned matmul K remainder), and the
            # row max is the TRUE max, keeping exp stable for arbitrarily
            # negative logits.
            s = _qk(q, k)[:, :kv_len]
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            out_ref[0, :, h * d:(h + 1) * d] = (
                _matmul(p.astype(v.dtype), v[:kv_len]) / l
            ).astype(out_ref.dtype)
            lse_ref[0, h] = jnp.broadcast_to(m + jnp.log(l),
                                             lse_ref.shape[2:])
            continue
        s = _mask_padding(_qk(q, k), ki, block_k, kv_len)

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
        def _finalize(h=h, m_new=m_new):
            l = l_ref[h, :, :1]
            out_ref[0, :, h * d:(h + 1) * d] = (
                acc_ref[h] / l).astype(out_ref.dtype)
            lse_ref[0, h] = jnp.broadcast_to(
                m_new + jnp.log(jnp.maximum(l, 1e-37)), lse_ref.shape[2:])


def _fwd(q, k, v, *, heads: int, block_q: int, block_k: int, kv_len: int):
    """q/k/v: [B, L_pad, heads*d] (q pre-scaled). Returns (out, lse)."""
    batch, q_len_pad, hd = q.shape
    d = hd // heads
    kv_len_pad = k.shape[1]
    grid = (batch, q_len_pad // block_q, kv_len_pad // block_k)
    multi = kv_len_pad // block_k > 1

    q_spec = pl.BlockSpec((1, block_q, hd), lambda b, qi, ki: (b, qi, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, hd), lambda b, qi, ki: (b, ki, 0),
                           memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, heads, block_q, STAT_LANES),
                            lambda b, qi, ki: (b, 0, qi, 0),
                            memory_space=pltpu.VMEM)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, kv_len=kv_len, block_k=block_k,
                          heads=heads, d=d),
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
        **_cparams(heads, block_q, block_k),
    )(q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _fused_bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                      dq_ref, dk_ref, dv_ref, *, kv_len: int, block_k: int,
                      heads: int, d: int):
    """Single-block fused backward: dq, dk, dv in one pass."""
    for h in range(heads):
        q = _band(q_ref, 0, h, d)
        k = _band(k_ref, 0, h, d)
        v = _band(v_ref, 0, h, d)
        o = _band(o_ref, 0, h, d).astype(jnp.float32)
        do = _band(do_ref, 0, h, d).astype(jnp.float32)
        lse = lse_ref[0, h][:, :1]
        delta = jnp.sum(o * do, axis=-1, keepdims=True)

        # no masking pass needed (see _fwd_kernel): logits are sliced to
        # the true kv length everywhere, so padding-column values never
        # enter any product; the dk/dv padding rows are written garbage-
        # free via the sliced stores below and dropped by the caller's
        # unpad slice anyway.
        s = _qk(q, k)[:, :kv_len]
        p = jnp.exp(s - lse)

        dob = do.astype(v.dtype)
        pb = p.astype(dob.dtype)
        dv_ref[0, :kv_len, h * d:(h + 1) * d] = _matmul_tn(
            pb, dob).astype(dv_ref.dtype)
        dp = _qk(dob, v[:kv_len])
        ds = (p * (dp - delta)).astype(q.dtype)
        dq_ref[0, :, h * d:(h + 1) * d] = _matmul(
            ds, k[:kv_len]).astype(dq_ref.dtype)
        dk_ref[0, :kv_len, h * d:(h + 1) * d] = _matmul_tn(
            ds, q).astype(dk_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dq_ref,
               acc_ref, *, kv_len: int, block_k: int, heads: int, d: int):
    ki = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    for h in range(heads):
        q = _band(q_ref, 0, h, d)
        k = _band(k_ref, 0, h, d)
        v = _band(v_ref, 0, h, d)
        o = _band(o_ref, 0, h, d).astype(jnp.float32)
        do = _band(do_ref, 0, h, d).astype(jnp.float32)
        lse = lse_ref[0, h][:, :1]
        delta = jnp.sum(o * do, axis=-1, keepdims=True)

        s = _mask_padding(_qk(q, k), ki, block_k, kv_len)
        p = jnp.exp(s - lse)
        dp = _qk(do.astype(v.dtype), v)
        ds = (p * (dp - delta)).astype(k.dtype)
        acc_ref[h] += _matmul(ds, k)

        @pl.when(ki == num_k - 1)
        def _finalize(h=h):
            dq_ref[0, :, h * d:(h + 1) * d] = acc_ref[h].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, dk_ref,
                dv_ref, dk_acc, dv_acc, *, kv_len: int, block_k: int,
                heads: int, d: int):
    qi = pl.program_id(2)
    num_q = pl.num_programs(2)
    ki = pl.program_id(1)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    for h in range(heads):
        q = _band(q_ref, 0, h, d)
        k = _band(k_ref, 0, h, d)
        v = _band(v_ref, 0, h, d)
        o = _band(o_ref, 0, h, d).astype(jnp.float32)
        do = _band(do_ref, 0, h, d).astype(jnp.float32)
        lse = lse_ref[0, h][:, :1]
        delta = jnp.sum(o * do, axis=-1, keepdims=True)

        s = _mask_padding(_qk(q, k), ki, block_k, kv_len)
        p = jnp.exp(s - lse)

        dob = do.astype(v.dtype)
        dv_acc[h] += _matmul_tn(p.astype(dob.dtype), dob)
        dp = _qk(dob, v)
        ds = (p * (dp - delta)).astype(q.dtype)
        dk_acc[h] += _matmul_tn(ds, q)

        @pl.when(qi == num_q - 1)
        def _finalize(h=h):
            dk_ref[0, :, h * d:(h + 1) * d] = dk_acc[h].astype(dk_ref.dtype)
            dv_ref[0, :, h * d:(h + 1) * d] = dv_acc[h].astype(dv_ref.dtype)


def _bwd_cost(bq, bk, heads, d):
    """VMEM cost model for the backward kernels at (bq, bk) blocks: the
    dkv kernel holds 4 kv-sized operand blocks (k, v, dk, dv) plus two
    kv-sized f32 accumulators and per-head logits-sized tiles."""
    hd = heads * d
    operands = (3 * bq + 4 * bk) * hd * 4          # double-buffered bf16
    acc = 2 * heads * bk * d * 4                   # dk/dv f32 accumulators
    s_tiles = heads * bq * bk * 4                  # live logits-sized f32
    return operands + acc + s_tiles


def _bwd_blocks(q_len_pad: int, kv_len_pad: int, block_q: int,
                block_k: int, heads: int, d: int):
    """Backward block sizes, re-derived from the forward's.

    The dkv kernel holds 4 kv-sized operand blocks (k, v, dk, dv) plus two
    kv-sized f32 accumulators, so the forward's prefer-one-kv-block choice
    can overflow scoped VMEM here (measured: 208x640 demands 17.4 MB).
    Unlike the forward, extra kv blocks in the backward cost only re-reads
    — p is recomputed from the saved lse, there is no online m/l carry —
    so kv splits are cheap. Blocks must divide the already-padded lengths.
    """
    cost = functools.partial(_bwd_cost, heads=heads, d=d)

    def divisors(total, align, start):
        return [b for b in range(start, align - 1, -align)
                if total % b == 0]

    budget = 13 * 1024 * 1024
    # raised single-block regime (mirrors _block_sizes): both kernels
    # read every operand exactly once, per-kernel vmem limit lifted
    if (q_len_pad <= _SINGLE_BLOCK_MAX_L
            and kv_len_pad <= _SINGLE_BLOCK_MAX_L
            and budget < cost(q_len_pad, kv_len_pad) <= _RAISED_CAP):
        return q_len_pad, kv_len_pad
    # bk candidates at 64-lane granularity so e.g. 640 can split as 2x320
    # (2 re-reads) instead of falling all the way to 5x128 (5 re-reads)
    for bq in divisors(q_len_pad, 16, block_q):
        for bk in divisors(kv_len_pad, 64, block_k):
            if cost(bq, bk) <= budget:
                return bq, bk
    # exhausted: smallest q rows with the smallest DIVIDING kv block —
    # r5 fix: the old fixed (16, 64) fallback did not divide a 592-row
    # pad (16*37), so _bwd's grid silently dropped the tail kv rows
    bk_fall = next((bk for bk in (64, 128, 16) if kv_len_pad % bk == 0),
                   kv_len_pad)
    return 16, bk_fall


def _bwd(q, k, v, out, lse, do, *, heads: int, block_q: int, block_k: int,
         kv_len: int):
    batch, q_len_pad, hd = q.shape
    d = hd // heads
    kv_len_pad = k.shape[1]
    block_q, block_k = _bwd_blocks(q_len_pad, kv_len_pad, block_q, block_k,
                                   heads, d)
    # non-dividing blocks would make the grid silently skip tail rows
    # (the r5 ViT-L @384 numerics bug) — fail loudly instead
    assert q_len_pad % block_q == 0 and kv_len_pad % block_k == 0, \
        (q_len_pad, block_q, kv_len_pad, block_k)
    num_q = q_len_pad // block_q
    num_k = kv_len_pad // block_k

    q_spec = pl.BlockSpec((1, block_q, hd), lambda b, qi, ki: (b, qi, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, hd), lambda b, qi, ki: (b, ki, 0),
                           memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, heads, block_q, STAT_LANES),
                            lambda b, qi, ki: (b, 0, qi, 0),
                            memory_space=pltpu.VMEM)

    # The fused backward holds 8 operand blocks + several logits-sized
    # tiles per head; beyond ~208x256 blocks its Mosaic stack exceeds the
    # 16 MB scoped VMEM (measured: 320x384 fails, 208x256 fits), so larger
    # single-block shapes take the two-kernel dq + dkv path instead.
    if num_q == 1 and num_k == 1 and block_q * block_k <= 56 * 1024:
        # fused one-pass backward: everything read once
        return pl.pallas_call(
            functools.partial(_fused_bwd_kernel, kv_len=kv_len,
                              block_k=block_k, heads=heads, d=d),
            grid=(batch, 1, 1),
            in_specs=[q_spec, kv_spec, kv_spec, q_spec, q_spec, lse_spec],
            out_specs=[q_spec, kv_spec, kv_spec],
            out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype),
                       jax.ShapeDtypeStruct(k.shape, k.dtype),
                       jax.ShapeDtypeStruct(v.shape, v.dtype)],
            interpret=_interpret(),
        **_cparams(heads, block_q, block_k),
        )(q, k, v, out, do, lse)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, kv_len=kv_len, block_k=block_k,
                          heads=heads, d=d),
        grid=(batch, num_q, num_k),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, q_spec, lse_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        scratch_shapes=[pltpu.VMEM((heads, block_q, d), jnp.float32)],
        interpret=_interpret(),
        **_cparams(heads, block_q, block_k),
    )(q, k, v, out, do, lse)

    # dk/dv: queries iterate innermost for each key block
    q_spec2 = pl.BlockSpec((1, block_q, hd), lambda b, ki, qi: (b, qi, 0),
                           memory_space=pltpu.VMEM)
    kv_spec2 = pl.BlockSpec((1, block_k, hd), lambda b, ki, qi: (b, ki, 0),
                            memory_space=pltpu.VMEM)
    lse_spec2 = pl.BlockSpec((1, heads, block_q, STAT_LANES),
                             lambda b, ki, qi: (b, 0, qi, 0),
                             memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, kv_len=kv_len, block_k=block_k,
                          heads=heads, d=d),
        grid=(batch, num_k, num_q),
        in_specs=[q_spec2, kv_spec2, kv_spec2, q_spec2, q_spec2, lse_spec2],
        out_specs=[kv_spec2, kv_spec2],
        out_shape=[jax.ShapeDtypeStruct(k.shape, k.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)],
        scratch_shapes=[pltpu.VMEM((heads, block_k, d), jnp.float32),
                        pltpu.VMEM((heads, block_k, d), jnp.float32)],
        interpret=_interpret(),
        **_cparams(heads, block_q, block_k),
    )(q, k, v, out, do, lse)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Custom-VJP wrapper over the padded [B, L_pad, heads*d] layout
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash(q, k, v, heads, block_q, block_k, q_len, kv_len):
    out, _ = _fwd(q, k, v, heads=heads, block_q=block_q, block_k=block_k,
                  kv_len=kv_len)
    return out


def _flash_fwd(q, k, v, heads, block_q, block_k, q_len, kv_len):
    out, lse = _fwd(q, k, v, heads=heads, block_q=block_q, block_k=block_k,
                    kv_len=kv_len)
    return out, (q, k, v, out, lse)


def _flash_bwd(heads, block_q, block_k, q_len, kv_len, residuals, do):
    q, k, v, out, lse = residuals
    # zero the cotangent on query-padding rows so they don't pollute dk/dv
    if q.shape[1] != q_len:
        row = jnp.arange(q.shape[1])[None, :, None]
        do = jnp.where(row < q_len, do, 0)
    dq, dk, dv = _bwd(q, k, v, out, lse, do, heads=heads, block_q=block_q,
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

    batch, q_len, heads, d = query.shape
    kv_len = key.shape[1]
    block_q, block_k = _block_sizes(q_len, kv_len, heads, d)
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_k)

    # free reshape: heads stay packed on lanes exactly as the projection
    # wrote them
    q = query.reshape(batch, q_len, heads * d)
    k = key.reshape(batch, kv_len, heads * d)
    v = value.reshape(batch, kv_len, heads * d)

    if q_pad != q_len:
        q = jnp.pad(q, ((0, 0), (0, q_pad - q_len), (0, 0)))
    if kv_pad != kv_len:
        pad = ((0, 0), (0, kv_pad - kv_len), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    out = _flash(q, k, v, heads, block_q, block_k, q_len, kv_len)
    return out[:, :q_len].reshape(batch, q_len, heads, d)


# ---------------------------------------------------------------------------
# Hybrid path: XLA-fused forward + Pallas backward
# ---------------------------------------------------------------------------
# Measured on v5e at ViT shapes (L=197, bs=128): XLA's own attention fusion
# has the fastest forward (0.38 ms vs our kernel's 0.84) but its backward
# trails the fused one-pass Pallas backward (1.48 vs 1.44 ms) AND it keeps
# the [B, h, Lq, Lkv] probability tensor as a residual. The hybrid takes
# XLA's forward, saves only (q, k, v, out, lse), and runs our backward —
# fastest fwd+bwd and the smallest residual footprint, which is what lets
# larger batches fit.

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _hybrid(q, k, v, heads):
    out, _ = _hybrid_forward(q, k, v)
    return out


def _hybrid_forward(q, k, v):
    logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                        preferred_element_type=jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)      # [B, h, Lq] f32
    weights = jnp.exp(logits - lse[..., None]).astype(v.dtype)
    out = jnp.einsum('bhqk,bkhd->bqhd', weights, v)
    return out, lse


def _hybrid_fwd_rule(q, k, v, heads):
    out, lse = _hybrid_forward(q, k, v)
    return out, (q, k, v, out, lse)


def _hybrid_bwd_rule(heads, residuals, do):
    q, k, v, out, lse = residuals
    batch, q_len, _, d = q.shape
    kv_len = k.shape[1]
    block_q, block_k = _block_sizes(q_len, kv_len, heads, d)
    q_pad = _round_up(q_len, block_q)
    kv_pad = _round_up(kv_len, block_k)

    def pack_q(x):
        x = x.reshape(batch, q_len, heads * d)
        if q_pad != q_len:
            x = jnp.pad(x, ((0, 0), (0, q_pad - q_len), (0, 0)))
        return x

    def pack_kv(x):
        x = x.reshape(batch, kv_len, heads * d)
        if kv_pad != kv_len:
            x = jnp.pad(x, ((0, 0), (0, kv_pad - kv_len), (0, 0)))
        return x

    do = jnp.where(
        jnp.arange(q_pad)[None, :, None] < q_len, pack_q(do), 0
    ) if q_pad != q_len else pack_q(do)

    lse_packed = jnp.broadcast_to(
        lse[..., None], (batch, heads, q_len, STAT_LANES))
    if q_pad != q_len:
        lse_packed = jnp.pad(lse_packed,
                             ((0, 0), (0, 0), (0, q_pad - q_len), (0, 0)))

    dq, dk, dv = _bwd(pack_q(q), pack_kv(k), pack_kv(v), pack_q(out),
                      lse_packed, do, heads=heads, block_q=block_q,
                      block_k=block_k, kv_len=kv_len)
    dq = dq[:, :q_len].reshape(batch, q_len, heads, d)
    dk = dk[:, :kv_len].reshape(batch, kv_len, heads, d)
    dv = dv[:, :kv_len].reshape(batch, kv_len, heads, d)
    return dq, dk, dv


_hybrid.defvjp(_hybrid_fwd_rule, _hybrid_bwd_rule)


def mha_hybrid(query, key, value):
    """XLA forward + Pallas backward on ``[B, L, heads, d]`` (q pre-scaled)."""
    return _hybrid(query, key, value, query.shape[-2])


def dispatch_mode(query, key, value, *, bias=None, pre_softmax_transform=None,
                  post_softmax_transform=None, dropout_rate=0.0):
    """Returns 'kernel' | 'hybrid' | None for auto dispatch."""
    if jax.default_backend() != 'tpu':
        return None
    if not shape_supported(query, key, value, bias=bias,
                           pre_softmax_transform=pre_softmax_transform,
                           post_softmax_transform=post_softmax_transform,
                           dropout_rate=dropout_rate):
        return None
    if query.shape[-3] * key.shape[-3] >= 1_000_000:
        return 'kernel'   # end-to-end crossover, see supported()
    # Short/mid sequences (ViT/CaiT @224 and @384): XLA's in-context
    # attention fusion beats both the full kernel and the hybrid end to end
    # (the custom_vjp residual boundary blocks XLA's cross-op optimization:
    # hybrid measured 764 vs 992 img/s, full kernel 231 vs 259 img/s @384,
    # both despite isolated-core wins). 'kernel'/'hybrid' stay available
    # via use_kernel=.
    return None
