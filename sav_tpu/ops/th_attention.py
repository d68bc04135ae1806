"""Talking-heads attention sublayer under ONE custom_vjp boundary.

CaiT's body blocks mix attention logits across heads before AND after the
softmax with learned [H, H] transforms (reference models/layers/attentions/
talking_heads.py:5-14, used at cait.py:32). On the XLA path those two tiny
einsums double the sublayer's train cost — measured 5.872 vs 3.176
ms/layer at CaiT-S24 shapes (benchmarks/cait_th_probe.py): XLA
materializes the [B, H, L, L] logits to HBM around every mix, forward and
backward. This kernel measures 3.794 ms/layer on the same lane and lifts
cait_s_24 @224 end to end from 598 to 1098 img/s (1.95x matched).

This module folds the whole span — LN -> q/k/v projections -> logits ->
pre-mix -> softmax -> post-mix -> PV -> output projection — into one
Pallas kernel per direction, so the logits (and both mixes) never leave
VMEM. Round-3's sublayer-boundary pattern (ops/fused_layer.py) supplies
the structure; what is new here:

  * the per-head logit tiles are kept as an unrolled list so the mixes
    run as scalar-weighted VMEM adds (the [H, H] matrices live in SMEM);
  * head bands are zero-padded 48 -> 64 lanes OUTSIDE the kernel (CaiT's
    head_ch=48 is below the 64-lane band the flash layout needs); padding
    columns are exact zeros end to end, so results and gradients match
    the unpadded math bit-for-bit up to float order;
  * the backward kernel recomputes the logits from q/k (flash-style — no
    [B, H, L, L] residual), applies both transposed mixes in VMEM, and
    emits dq/dk/dv plus the two [H, H] transform gradients.

residual=False by default: CaiT applies LayerScale + stochastic depth
between the sublayer and the skip connection, so those stay outside the
boundary (elementwise, XLA-fused).

For sequences past the unrolled-list VMEM budget (CaiT @384, L=577), a
q-BLOCKED core takes over (`th_mode` -> 'blocked'): LN + projections run
in XLA inside the same custom_vjp boundary, and the Pallas core processes
one q block against the full kv rows per grid step — exact softmax (no
online carry; the flash core is single-kv-block at these L anyway) with
the mixes still in VMEM. dk/dv/dM accumulate in f32 scratch across a
batch element's q blocks and flush on the last one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sav_tpu.ops import flash_attention as fa
from sav_tpu.ops.fused_layer import LN_EPS, _layernorm, _layernorm_bwd

BAND = fa.BAND
STAT_LANES = fa.STAT_LANES
# one f32 logits tile list is heads * lp * lane-padded(l) * 4 bytes; the
# backward keeps ~4 lists live -> cap a list at ~3 MB so the peak stays
# inside the kernel's scoped-VMEM budget WITH the in-scan headroom.
# r5: 3.5 MB admits cait_m @224 (h=16, 3.41 MB lists). At that size the
# kernels carry a raised per-kernel vmem limit (_fused_cparams below) —
# without it the pair compiled standalone (and WON the light probe,
# 159.9 vs 156.5 per-op XLA, benchmarks/cait_m_probe.py) but 500'd
# inside the full train-step scan (the +~2 MB in-scan Mosaic stack).
# Geometries under 3 MB keep the default compiler params byte-for-byte.
_MAX_LIST_BYTES = int(3.5 * 1024 * 1024)


def th_supported(l: int, num_heads: int, head_ch: int) -> bool:
    """Single-block geometry + VMEM budget for the unrolled logit lists."""
    lp = max(fa._round_up(l, 16), 64)
    lanes = fa._round_up(l, 128)
    return (head_ch <= BAND
            and num_heads * lp * lanes * 4 <= _MAX_LIST_BYTES)


# blocked-core q-block size: the bwd's phased liveness (one [bq, l] list
# family at a time, logits recomputed per j) keeps 128-row blocks inside
# the scoped-VMEM limit for both directions
_BLK_Q_FWD = 128
_BLK_Q_BWD = 128      # 160 measured 10% slower at CaiT @384 shapes
_MAX_BLK_LIST_BYTES = 4 * 1024 * 1024


def _blk_rows(lp: int, want: int) -> int:
    """Largest block <= want that divides the 128-aligned row pad."""
    bq = want
    while lp % bq:
        bq -= 32
    return bq


def th_blocked_supported(l: int, num_heads: int, head_ch: int) -> bool:
    """q-blocked core: full-kv logit rows per q block (exact softmax, no
    online carry — mirrors the flash core's single-kv-block regime at
    these L), heads unrolled so the [H, H] mixes run in VMEM."""
    lanes = fa._round_up(l, 128)
    return (head_ch <= BAND
            and num_heads * _BLK_Q_BWD * lanes * 4 <= _MAX_BLK_LIST_BYTES)


def th_mode(l: int, num_heads: int, head_ch: int):
    """'fused' (whole span in one kernel), 'blocked' (XLA LN/proj inside
    the boundary + q-blocked Pallas core), or None (jnp path).

    The blocked core only routes at l >= 320, its receipted regime
    (built for @384, where it took cait_s from 93.1 to 181.3 img/s).
    Round-5 receipt for the floor: cait_m_48 @224 (l=196, h=16 — the
    'fused' list misses its VMEM cap, so 'blocked' was the fallback)
    measured 126.0 img/s blocked vs 156.5 per-op XLA — q-blocking pays
    re-reads that only amortize at @384 row counts
    (benchmarks/cait_m_probe.py, sweep_r05)."""
    if th_supported(l, num_heads, head_ch):
        return 'fused'
    if l >= 320 and th_blocked_supported(l, num_heads, head_ch):
        return 'blocked'
    return None


def _fused_cparams(heads: int, lp: int, l: int):
    """Raised per-kernel VMEM limit for fused-mode geometries whose f32
    logit lists exceed what the 16 MB default absorbs (r5: cait_m @224,
    h=16 -> 3.41 MB/list, ~4 live in the backward — compiled standalone
    but 500'd inside the train-step scan until raised). Geometries under
    the old 3 MB cap keep the default params, so every receipted config
    compiles byte-identically."""
    if fa._interpret():
        return {}
    lanes = fa._round_up(l, 128)
    if heads * lp * lanes * 4 > 3 * 1024 * 1024:
        return {'compiler_params': pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024)}
    return {}


def _mix_rows(m_ref, tiles, i):
    """out_i = sum_j m[j, i] * tiles[j] — the reference's head transform
    ('h i, b h ... -> b i ...', talking_heads.py:5-14) applied to one
    output head's tile, scalars streamed from SMEM."""
    acc = m_ref[0, i] * tiles[0]
    for j in range(1, len(tiles)):
        acc = acc + m_ref[j, i] * tiles[j]
    return acc


def _dm_tile(scalars, heads):
    """[heads, 128] f32 tile holding scalars[i][j] at (i, j)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (heads, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (heads, 128), 1)
    acc = jnp.zeros((heads, 128), jnp.float32)
    for i in range(heads):
        for j in range(heads):
            acc = acc + jnp.where((rows == i) & (cols == j),
                                  scalars[i][j], 0.0)
    return acc


# ------------------------------------------------------------ forward

def _th_fwd_kernel(x_ref, scale_ref, bias_ref, wq_ref, wk_ref, wv_ref,
                   wo_ref, mpre_ref, mpost_ref, out_ref, *res_refs,
                   l: int, heads: int, dp: int, d_logical: int,
                   eps: float, residual: bool):
    save_res = bool(res_refs)
    if save_res:
        q_ref, k_ref, v_ref, attn_ref, lse_ref = res_refs
    xf = x_ref[0].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    xhat = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = (xhat * scale_ref[0] + bias_ref[0]).astype(x_ref.dtype)

    sc = 1.0 / (d_logical ** 0.5)
    q = (fa._matmul(y, wq_ref[...]) * sc).astype(x_ref.dtype)
    k = fa._matmul(y, wk_ref[...]).astype(x_ref.dtype)
    v = fa._matmul(y, wv_ref[...]).astype(x_ref.dtype)
    if save_res:
        q_ref[0] = q
        k_ref[0] = k
        v_ref[0] = v

    band = lambda a, h: a[:, h * dp:(h + 1) * dp]
    s = [fa._qk(band(q, h), band(k, h))[:, :l] for h in range(heads)]
    st = [_mix_rows(mpre_ref, s, i) for i in range(heads)]

    pn = []
    for i in range(heads):
        m = jnp.max(st[i], axis=1, keepdims=True)
        p = jnp.exp(st[i] - m)
        lsum = jnp.sum(p, axis=1, keepdims=True)
        pn.append(p / lsum)
        if save_res:
            lse_ref[0, i] = jnp.broadcast_to(m + jnp.log(lsum),
                                             lse_ref.shape[2:])

    attn_bands = []
    for i in range(heads):
        pt = _mix_rows(mpost_ref, pn, i)
        band_i = fa._matmul(pt.astype(v.dtype),
                            band(v, i)[:l]).astype(x_ref.dtype)
        if save_res:
            attn_ref[0, :, i * dp:(i + 1) * dp] = band_i.astype(
                attn_ref.dtype)
        else:
            attn_bands.append(band_i)

    attn = (attn_ref[0].astype(x_ref.dtype) if save_res
            else jnp.concatenate(attn_bands, axis=1))
    out = fa._matmul(attn, wo_ref[...])
    if residual:
        out = xf + out
    out_ref[0] = out.astype(out_ref.dtype)


def _th_fused_fwd(x, scale, bias, wq_f, wk_f, wv_f, wo_f, m_pre, m_post,
                  heads, dp, d_logical, eps, residual,
                  save_residuals=True):
    """x [B, L, D] (padded weights, flat [D, H*dp] / [H*dp, D] layout).

    ``save_residuals=False`` (non-differentiated primal: inference/eval)
    skips the five backward-residual HBM stores; returns (out, None)."""
    b, l, dim = x.shape
    hd = heads * dp
    cdt = x.dtype
    lp = max(fa._round_up(l, 16), 64)
    x_p = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0))) if lp != l else x

    row = lambda a: a.astype(jnp.float32).reshape(1, dim)
    x_spec = pl.BlockSpec((1, lp, dim), lambda bi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    hd_spec = pl.BlockSpec((1, lp, hd), lambda bi: (bi, 0, 0),
                           memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, dim), lambda bi: (0, 0),
                            memory_space=pltpu.VMEM)
    w_in_spec = pl.BlockSpec((dim, hd), lambda bi: (0, 0),
                             memory_space=pltpu.VMEM)
    w_out_spec = pl.BlockSpec((hd, dim), lambda bi: (0, 0),
                              memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    lse_spec = pl.BlockSpec((1, heads, lp, STAT_LANES),
                            lambda bi: (bi, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    out_specs = [x_spec]
    out_shape = [jax.ShapeDtypeStruct((b, lp, dim), cdt)]
    if save_residuals:
        out_specs += [hd_spec, hd_spec, hd_spec, hd_spec, lse_spec]
        out_shape += [
            jax.ShapeDtypeStruct((b, lp, hd), cdt),
            jax.ShapeDtypeStruct((b, lp, hd), cdt),
            jax.ShapeDtypeStruct((b, lp, hd), cdt),
            jax.ShapeDtypeStruct((b, lp, hd), cdt),
            jax.ShapeDtypeStruct((b, heads, lp, STAT_LANES), jnp.float32),
        ]
    outs = pl.pallas_call(
        functools.partial(_th_fwd_kernel, l=l, heads=heads, dp=dp,
                          d_logical=d_logical, eps=eps, residual=residual),
        grid=(b,),
        in_specs=[x_spec, vec_spec, vec_spec, w_in_spec, w_in_spec,
                  w_in_spec, w_out_spec, m_spec, m_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=fa._interpret(),
        **_fused_cparams(heads, lp, l),
    )(x_p, row(scale), row(bias), wq_f, wk_f, wv_f, wo_f,
      m_pre.astype(jnp.float32), m_post.astype(jnp.float32))
    if not save_residuals:
        return outs[0][:, :l], None
    out, qp, kp, vp, attn_p, lse = outs
    return out[:, :l], (qp, kp, vp, attn_p, lse)


# ------------------------------------------------------------ backward

def _th_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, mpre_ref,
                   mpost_ref, dq_ref, dk_ref, dv_ref, dmpre_ref,
                   dmpost_ref, *, l: int, heads: int, dp: int):
    lp = q_ref.shape[1]
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]          # zero rows beyond l — keeps every grad exact
    band = lambda a, h: a[:, h * dp:(h + 1) * dp]
    pad_l = lambda t: jnp.pad(t, ((0, 0), (0, lp - l)))

    s = [fa._qk(band(q, h), band(k, h))[:, :l] for h in range(heads)]
    pn = []
    for i in range(heads):
        st = _mix_rows(mpre_ref, s, i)
        pn.append(jnp.exp(st - lse_ref[0, i][:, :1]))

    # post-mix backward: da_i = do_i @ v_i^T feeds every dpn_j (transposed
    # mix) and the dM_post entries; pt_i (recomputed mixed probs) feeds dv
    dpn = [jnp.zeros((lp, l), jnp.float32) for _ in range(heads)]
    dmpost = [[None] * heads for _ in range(heads)]
    for i in range(heads):
        da = fa._qk(band(do, i), band(v, i)[:l])
        for j in range(heads):
            # fwd: a_i = sum_j M[j, i] pn_j  =>  dpn_j += M[j, i] da_i
            dpn[j] = dpn[j] + mpost_ref[j, i] * da
            dmpost[j][i] = jnp.sum(da * pn[j])
        pt = _mix_rows(mpost_ref, pn, i)
        dv_ref[0, :, i * dp:(i + 1) * dp] = fa._matmul_tn(
            pad_l(pt).astype(do.dtype), band(do, i)).astype(dv_ref.dtype)

    # softmax backward per head, then the transposed pre-mix
    ds = [jnp.zeros((lp, l), jnp.float32) for _ in range(heads)]
    dmpre = [[None] * heads for _ in range(heads)]
    for i in range(heads):
        dst = pn[i] * (dpn[i] - jnp.sum(dpn[i] * pn[i], axis=1,
                                        keepdims=True))
        for j in range(heads):
            ds[j] = ds[j] + mpre_ref[j, i] * dst
            dmpre[j][i] = jnp.sum(dst * s[j])

    for j in range(heads):
        dq_ref[0, :, j * dp:(j + 1) * dp] = fa._matmul(
            ds[j].astype(q.dtype), band(k, j)[:l]).astype(dq_ref.dtype)
        dk_ref[0, :, j * dp:(j + 1) * dp] = fa._matmul_tn(
            pad_l(ds[j]).astype(q.dtype), band(q, j)).astype(dk_ref.dtype)

    dmpre_ref[0] = _dm_tile(dmpre, heads)
    dmpost_ref[0] = _dm_tile(dmpost, heads)


def th_fused_bwd(qp, kp, vp, lse, do_p, m_pre, m_post, *, l, heads, dp):
    """dq/dk/dv [B, lp, H*dp] (pre-scaling chain as in flash) + dM pair."""
    b, lp, hd = qp.shape
    cdt = qp.dtype
    hd_spec = pl.BlockSpec((1, lp, hd), lambda bi: (bi, 0, 0),
                           memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, heads, lp, STAT_LANES),
                            lambda bi: (bi, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    dm_spec = pl.BlockSpec((1, heads, 128), lambda bi: (bi, 0, 0),
                           memory_space=pltpu.VMEM)

    dq, dk, dv, dmpre_b, dmpost_b = pl.pallas_call(
        functools.partial(_th_bwd_kernel, l=l, heads=heads, dp=dp),
        grid=(b,),
        in_specs=[hd_spec, hd_spec, hd_spec, hd_spec, lse_spec, m_spec,
                  m_spec],
        out_specs=[hd_spec, hd_spec, hd_spec, dm_spec, dm_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, lp, hd), cdt),
            jax.ShapeDtypeStruct((b, lp, hd), cdt),
            jax.ShapeDtypeStruct((b, lp, hd), cdt),
            jax.ShapeDtypeStruct((b, heads, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, heads, 128), jnp.float32),
        ],
        interpret=fa._interpret(),
        **_fused_cparams(heads, lp, l),
    )(qp, kp, vp, do_p, lse, m_pre.astype(jnp.float32),
      m_post.astype(jnp.float32))
    dm_pre = jnp.sum(dmpre_b, axis=0)[:, :heads]
    dm_post = jnp.sum(dmpost_b, axis=0)[:, :heads]
    return dq, dk, dv, dm_pre, dm_post


# ------------------------------------------- blocked core (L > unrolled)

def _th_blk_fwd_kernel(q_ref, k_ref, v_ref, mpre_ref, mpost_ref,
                       attn_ref, lse_ref, *, l: int, heads: int, dp: int):
    """One q block x full kv rows: logits sliced to the true kv length so
    padding columns never reach the mixes or softmax (fa._fwd_kernel's
    single-block discipline)."""
    qb = lambda h: q_ref[0][:, h * dp:(h + 1) * dp]
    kb = lambda h: k_ref[0][:, h * dp:(h + 1) * dp]
    vb = lambda h: v_ref[0][:, h * dp:(h + 1) * dp]

    s = [fa._qk(qb(h), kb(h))[:, :l] for h in range(heads)]
    st = [_mix_rows(mpre_ref, s, i) for i in range(heads)]
    pn = []
    for i in range(heads):
        m = jnp.max(st[i], axis=1, keepdims=True)
        p = jnp.exp(st[i] - m)
        lsum = jnp.sum(p, axis=1, keepdims=True)
        pn.append(p / lsum)
        lse_ref[0, i] = jnp.broadcast_to(m + jnp.log(lsum),
                                         lse_ref.shape[2:])
    for i in range(heads):
        pt = _mix_rows(mpost_ref, pn, i)
        attn_ref[0, :, i * dp:(i + 1) * dp] = fa._matmul(
            pt.astype(v_ref.dtype), vb(i)[:l]).astype(attn_ref.dtype)


def _th_blk_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, mpre_ref,
                       mpost_ref, dq_ref, dk_ref, dv_ref, dmpre_ref,
                       dmpost_ref, dk_acc, dv_acc, dm_acc,
                       *, l: int, heads: int, dp: int):
    """Per q block: recompute logits, run the transposed mixes in VMEM,
    emit dq directly; dk/dv/dM accumulate in f32 scratch across the q
    blocks of one batch element and flush on the last block.

    The raw per-head logits are never kept as a list — they are
    recomputed per j where a phase needs them (two extra QK matmul
    sweeps, ~0.4 GF/image) so only ONE [bq, l]-list family is live per
    phase. That halves peak VMEM vs the naive ordering and lets the
    backward run the same 128-row blocks as the forward instead of 64."""
    qi = pl.program_id(1)
    nq = pl.num_programs(1)
    kvp = k_ref.shape[1]

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)
        dm_acc[...] = jnp.zeros_like(dm_acc)

    qb = lambda h: q_ref[0][:, h * dp:(h + 1) * dp]
    kb = lambda h: k_ref[0][:, h * dp:(h + 1) * dp]
    vb = lambda h: v_ref[0][:, h * dp:(h + 1) * dp]
    dob = lambda h: do_ref[0][:, h * dp:(h + 1) * dp]
    pad_kv = lambda t: jnp.pad(t, ((0, 0), (0, kvp - l)))
    bq = q_ref.shape[1]

    # phase 1: pre-mix accumulated st (s_j transient, no s list), then pn
    st = [jnp.zeros((bq, l), jnp.float32) for _ in range(heads)]
    for j in range(heads):
        s_j = fa._qk(qb(j), kb(j))[:, :l]
        for i in range(heads):
            st[i] = st[i] + mpre_ref[j, i] * s_j
    pn = [jnp.exp(st[i] - lse_ref[0, i][:, :1]) for i in range(heads)]

    # phase 2: post-mix backward — da transient per i feeds dpn and dM2
    dpn = [jnp.zeros((bq, l), jnp.float32) for _ in range(heads)]
    dmpost = [[None] * heads for _ in range(heads)]
    for i in range(heads):
        da = fa._qk(dob(i), vb(i)[:l])
        for j in range(heads):
            dpn[j] = dpn[j] + mpost_ref[j, i] * da
            dmpost[j][i] = jnp.sum(da * pn[j])
        pt = _mix_rows(mpost_ref, pn, i)
        dv_acc[:, i * dp:(i + 1) * dp] += fa._matmul_tn(
            pad_kv(pt).astype(do_ref.dtype), dob(i))

    # phase 3: softmax backward, then the transposed pre-mix applied to
    # the COTANGENTS first (dstm_j = sum_i M[j,i] dst_i — H^2 scalar-
    # weighted VPU adds), so dq/dk are ONE matmul pair per j:
    #   ds_j = dstm_j;  dq_j = ds_j @ k_j;  dk_j = ds_j' @ q_j.
    # The earlier per-(i, j) partial-grid formulation (one [bq, dp]
    # matmul per PAIR, scalars on the partials) paid 8x the dq/dk MXU
    # FLOPs to keep only one [bq, l] list live — a trade made when the
    # 16 MB scoped-VMEM default looked like a wall; with this kernel's
    # raised vmem_limit_bytes the dst list (+2.6 MB f32) fits, and the
    # cheap-FLOP form measures 9.30 -> 7.72 ms/layer at CaiT @384 probe
    # shapes (docs/PERFORMANCE.md round-3 TH section). dM1 reduces
    # dst_i against s_j recomputed once per j (H extra QK matmuls).
    dst = []
    for i in range(heads):
        dst.append((pn[i] * (dpn[i] - jnp.sum(dpn[i] * pn[i], axis=1,
                                              keepdims=True))))
    dmpre = [[None] * heads for _ in range(heads)]
    for j in range(heads):
        s_j = fa._qk(qb(j), kb(j))[:, :l]
        for i in range(heads):
            dmpre[j][i] = jnp.sum(dst[i] * s_j)

    for j in range(heads):
        dstm = mpre_ref[j, 0] * dst[0]
        for i in range(1, heads):
            dstm = dstm + mpre_ref[j, i] * dst[i]
        dstm = dstm.astype(q_ref.dtype)
        dq_ref[0, :, j * dp:(j + 1) * dp] = fa._matmul(
            dstm, kb(j)[:l]).astype(dq_ref.dtype)
        dk_acc[:, j * dp:(j + 1) * dp] += fa._matmul_tn(pad_kv(dstm),
                                                        qb(j))

    dm_acc[0] += _dm_tile(dmpre, heads)
    dm_acc[1] += _dm_tile(dmpost, heads)

    @pl.when(qi == nq - 1)
    def _flush():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)
        dmpre_ref[0] = dm_acc[0]
        dmpost_ref[0] = dm_acc[1]


def _th_blocked_fwd(x, scale, bias, wq_f, wk_f, wv_f, wo_f, m_pre, m_post,
                    heads, dp, d_logical, eps, residual):
    """XLA LN + projections inside the boundary, q-blocked Pallas core,
    XLA output projection — the @384 fused_layer structure with the head
    mixes folded into the core."""
    b, l, dim = x.shape
    hd = heads * dp
    cdt = x.dtype
    lp = fa._round_up(l, 128)
    sc = jnp.asarray(1.0 / (d_logical ** 0.5), cdt)

    y, _, _ = _layernorm(x, scale, bias, eps)
    pad_rows = lambda a: jnp.pad(a, ((0, 0), (0, lp - l), (0, 0))) \
        if lp != l else a
    qp = pad_rows(jnp.einsum('bld,dc->blc', y, wq_f) * sc)
    kp = pad_rows(jnp.einsum('bld,dc->blc', y, wk_f))
    vp = pad_rows(jnp.einsum('bld,dc->blc', y, wv_f))

    bq = _blk_rows(lp, _BLK_Q_FWD)
    blk_spec = pl.BlockSpec((1, bq, hd), lambda bi, qi: (bi, qi, 0),
                            memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, lp, hd), lambda bi, qi: (bi, 0, 0),
                           memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    lse_spec = pl.BlockSpec((1, heads, bq, STAT_LANES),
                            lambda bi, qi: (bi, 0, qi, 0),
                            memory_space=pltpu.VMEM)

    attn_p, lse = pl.pallas_call(
        functools.partial(_th_blk_fwd_kernel, l=l, heads=heads, dp=dp),
        grid=(b, lp // bq),
        in_specs=[blk_spec, kv_spec, kv_spec, m_spec, m_spec],
        out_specs=[blk_spec, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, lp, hd), cdt),
            jax.ShapeDtypeStruct((b, heads, lp, STAT_LANES), jnp.float32),
        ],
        interpret=fa._interpret(),
    )(qp, kp, vp, m_pre.astype(jnp.float32), m_post.astype(jnp.float32))

    out = jnp.einsum('blc,cd->bld', attn_p[:, :l].astype(cdt), wo_f)
    if residual:
        out = x + out
    return out.astype(cdt), (qp, kp, vp, attn_p, lse)


def th_blocked_bwd(qp, kp, vp, lse, do_p, m_pre, m_post, *, l, heads, dp):
    """Blocked counterpart of th_fused_bwd (same contract)."""
    b, lp, hd = qp.shape
    cdt = qp.dtype
    bq = _blk_rows(lp, _BLK_Q_BWD)
    blk_spec = pl.BlockSpec((1, bq, hd), lambda bi, qi: (bi, qi, 0),
                            memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, lp, hd), lambda bi, qi: (bi, 0, 0),
                           memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    lse_spec = pl.BlockSpec((1, heads, bq, STAT_LANES),
                            lambda bi, qi: (bi, 0, qi, 0),
                            memory_space=pltpu.VMEM)
    dm_spec = pl.BlockSpec((1, heads, 128), lambda bi, qi: (bi, 0, 0),
                           memory_space=pltpu.VMEM)

    dq, dk, dv, dmpre_b, dmpost_b = pl.pallas_call(
        functools.partial(_th_blk_bwd_kernel, l=l, heads=heads, dp=dp),
        grid=(b, lp // bq),
        in_specs=[blk_spec, kv_spec, kv_spec, blk_spec, lse_spec, m_spec,
                  m_spec],
        out_specs=[blk_spec, kv_spec, kv_spec, dm_spec, dm_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, lp, hd), cdt),
            jax.ShapeDtypeStruct((b, lp, hd), cdt),
            jax.ShapeDtypeStruct((b, lp, hd), cdt),
            jax.ShapeDtypeStruct((b, heads, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, heads, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((lp, hd), jnp.float32),
            pltpu.VMEM((lp, hd), jnp.float32),
            pltpu.VMEM((2, heads, 128), jnp.float32),
        ],
        # the phased 128-row backward peaks ~18 MB of scoped VMEM; v5e has
        # 128 MB physical, so raise this kernel's limit past the 16 MB
        # default rather than shrink the blocks (64-row blocks measured
        # only 1.10x vs XLA; see docs/PERFORMANCE.md round-3 TH section)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=fa._interpret(),
    )(qp, kp, vp, do_p, lse, m_pre.astype(jnp.float32),
      m_post.astype(jnp.float32))
    dm_pre = jnp.sum(dmpre_b, axis=0)[:, :heads]
    dm_post = jnp.sum(dmpost_b, axis=0)[:, :heads]
    return dq, dk, dv, dm_pre, dm_post


# ------------------------------------------------------- custom_vjp span

def _pad_weights(wq, wk, wv, wo, heads, d_logical, dp, cdt):
    """Zero-pads head bands d_logical -> dp and flattens to kernel layout.

    Zero columns/rows are exact: padded q/k/v channels are zero (zero
    weight columns), contribute nothing to logits or PV, and the padded
    wo rows are zero so the output projection ignores them.
    """
    dim = wq.shape[0]
    pad3 = ((0, 0), (0, 0), (0, dp - d_logical))
    wq_f = jnp.pad(wq, pad3).reshape(dim, heads * dp).astype(cdt)
    wk_f = jnp.pad(wk, pad3).reshape(dim, heads * dp).astype(cdt)
    wv_f = jnp.pad(wv, pad3).reshape(dim, heads * dp).astype(cdt)
    wo_f = jnp.pad(wo, ((0, 0), (0, dp - d_logical), (0, 0))).reshape(
        heads * dp, dim).astype(cdt)
    return wq_f, wk_f, wv_f, wo_f


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def th_attention_sublayer(x, scale, bias, wq, wk, wv, wo, m_pre, m_post,
                          num_heads, eps=LN_EPS, residual=False):
    """``W_o @ TalkingHeadsMHA(LN(x))`` (+x if residual) as one span.

    x [B, L, D]; wq/wk/wv [D, H, d]; wo [H, d, D]; m_pre/m_post [H, H].
    Checkpoint layout matches AttentionBlock with talking_heads=True
    (reference attention.py:29-63 + talking_heads.py:5-14).
    """
    # primal (non-differentiated) call: skip the backward-residual stores
    out, _ = _th_forward(x, scale, bias, wq, wk, wv, wo, m_pre, m_post,
                         num_heads, eps, residual, save_residuals=False)
    return out


def _th_forward(x, scale, bias, wq, wk, wv, wo, m_pre, m_post, num_heads,
                eps, residual, save_residuals=True):
    d_logical = wq.shape[2]
    dp = fa._round_up(d_logical, BAND)
    wq_f, wk_f, wv_f, wo_f = _pad_weights(wq, wk, wv, wo, num_heads,
                                          d_logical, dp, x.dtype)
    if th_supported(x.shape[1], num_heads, d_logical):
        return _th_fused_fwd(x, scale, bias, wq_f, wk_f, wv_f, wo_f,
                             m_pre, m_post, num_heads, dp, d_logical, eps,
                             residual, save_residuals)
    return _th_blocked_fwd(x, scale, bias, wq_f, wk_f, wv_f, wo_f, m_pre,
                           m_post, num_heads, dp, d_logical, eps, residual)


def _th_sublayer_fwd(x, scale, bias, wq, wk, wv, wo, m_pre, m_post,
                     num_heads, eps, residual):
    out, core = _th_forward(x, scale, bias, wq, wk, wv, wo, m_pre, m_post,
                            num_heads, eps, residual)
    return out, (x, scale, bias, wq, wk, wv, wo, m_pre, m_post, core)


def _th_sublayer_bwd(num_heads, eps, residual, saved, g):
    x, scale, bias, wq, wk, wv, wo, m_pre, m_post, core = saved
    qp, kp, vp, attn_p, lse = core
    b, l, dim = x.shape
    d_logical = wq.shape[2]
    dp = qp.shape[2] // num_heads
    hd = num_heads * dp
    lp = qp.shape[1]
    cdt = x.dtype
    sc = jnp.asarray(1.0 / jnp.sqrt(d_logical), cdt)
    g_c = g.astype(cdt)

    wo_f = jnp.pad(wo, ((0, 0), (0, dp - d_logical), (0, 0))).reshape(
        hd, dim).astype(cdt)
    d_attn = jnp.einsum('bld,cd->blc', g_c, wo_f)          # [B, l, H*dp]
    dwo_f = jnp.einsum('blc,bld->cd', attn_p[:, :l], g_c,
                       preferred_element_type=jnp.float32)
    do_p = jnp.pad(d_attn, ((0, 0), (0, lp - l), (0, 0)))

    core_bwd = th_fused_bwd if th_supported(l, num_heads, d_logical) \
        else th_blocked_bwd
    dq_p, dk_p, dv_p, dm_pre, dm_post = core_bwd(
        qp, kp, vp, lse, do_p, m_pre, m_post, l=l, heads=num_heads, dp=dp)
    dq_f = dq_p[:, :l] * sc                  # chain the q pre-scaling
    dk_f = dk_p[:, :l]
    dv_f = dv_p[:, :l]

    # projection/LN backward in XLA (LN fuses into the GEMMs for free)
    y, xhat, inv = _layernorm(x, scale, bias, eps)
    dwq_f = jnp.einsum('bld,blc->dc', y, dq_f,
                       preferred_element_type=jnp.float32)
    dwk_f = jnp.einsum('bld,blc->dc', y, dk_f,
                       preferred_element_type=jnp.float32)
    dwv_f = jnp.einsum('bld,blc->dc', y, dv_f,
                       preferred_element_type=jnp.float32)
    wq_f, wk_f, wv_f, _ = _pad_weights(wq, wk, wv, wo, num_heads,
                                       d_logical, dp, cdt)
    dy = (jnp.einsum('blc,dc->bld', dq_f, wq_f)
          + jnp.einsum('blc,dc->bld', dk_f, wk_f)
          + jnp.einsum('blc,dc->bld', dv_f, wv_f))
    dx_ln, dscale, dbias = _layernorm_bwd(dy, xhat, inv, scale)
    dx = (dx_ln + g.astype(jnp.float32)).astype(cdt) if residual \
        else dx_ln.astype(cdt)

    unpad_in = lambda dw: dw.reshape(dim, num_heads, dp)[..., :d_logical]
    dwo = dwo_f.reshape(num_heads, dp, dim)[:, :d_logical]
    return (dx, dscale.astype(scale.dtype), dbias.astype(bias.dtype),
            unpad_in(dwq_f).astype(wq.dtype),
            unpad_in(dwk_f).astype(wk.dtype),
            unpad_in(dwv_f).astype(wv.dtype),
            dwo.astype(wo.dtype),
            dm_pre.astype(m_pre.dtype), dm_post.astype(m_post.dtype))


th_attention_sublayer.defvjp(_th_sublayer_fwd, _th_sublayer_bwd)


# -------------------------------------------------------------- jnp twin

def th_sublayer_reference(x, scale, bias, wq, wk, wv, wo, m_pre, m_post,
                          eps=LN_EPS, residual=False):
    """Pure-jnp twin of the span (reference semantics) for equality tests."""
    d = wq.shape[2]
    cdt = x.dtype
    y, _, _ = _layernorm(x, scale, bias, eps)
    q = jnp.einsum('bld,dhc->blhc', y, wq.astype(cdt)) / jnp.sqrt(
        jnp.asarray(d, cdt))
    k = jnp.einsum('bld,dhc->blhc', y, wk.astype(cdt))
    v = jnp.einsum('bld,dhc->blhc', y, wv.astype(cdt))
    s = jnp.einsum('bqhc,bphc->bhqp', q, k,
                   preferred_element_type=jnp.float32)
    s = jnp.einsum('hi,bhqp->biqp', m_pre.astype(jnp.float32), s)
    a = jax.nn.softmax(s, axis=-1)
    a = jnp.einsum('hi,bhqp->biqp', m_post.astype(jnp.float32), a)
    o = jnp.einsum('bhqp,bphc->bqhc', a.astype(cdt), v)
    out = jnp.einsum('bqhc,hcd->bqd', o, wo.astype(cdt))
    return x + out if residual else out


# --------------------- int8 serving forward (projections quantized)
#
# Serving-only twin of the lean fused forward above (same pattern as
# fused_layer.attention_sublayer_q8): q/k/v projections int8 off ONE
# per-row quantization of the LN output, the talking-heads mixes and
# softmax bf16/f32 exactly as the bf16 kernel, out-projection int8 on the
# concatenated head bands. No custom_vjp — predict.py --quantized all.


def _th_q8_kernel(x_ref, scale_ref, bias_ref, wq_ref, sq_ref, wk_ref,
                  sk_ref, wv_ref, sv_ref, wo_ref, so_ref, mpre_ref,
                  mpost_ref, out_ref, *, l: int, heads: int, dp: int,
                  d_logical: int, eps: float, residual: bool):
    from sav_tpu.ops.int8_matmul_kernel import _quantize_tile

    xf = x_ref[0].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * scale_ref[0] + bias_ref[0]

    yq, ys = _quantize_tile(y)
    cdt = x_ref.dtype

    def proj(w_ref, s_ref):
        acc = jax.lax.dot_general(yq, w_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (ys * s_ref[...])

    sc = 1.0 / (d_logical ** 0.5)
    q = (proj(wq_ref, sq_ref) * sc).astype(cdt)
    k = proj(wk_ref, sk_ref).astype(cdt)
    v = proj(wv_ref, sv_ref).astype(cdt)

    band = lambda a, h: a[:, h * dp:(h + 1) * dp]
    s = [fa._qk(band(q, h), band(k, h))[:, :l] for h in range(heads)]
    st = [_mix_rows(mpre_ref, s, i) for i in range(heads)]

    pn = []
    for i in range(heads):
        m = jnp.max(st[i], axis=1, keepdims=True)
        p = jnp.exp(st[i] - m)
        pn.append(p / jnp.sum(p, axis=1, keepdims=True))

    attn_bands = []
    for i in range(heads):
        pt = _mix_rows(mpost_ref, pn, i)
        attn_bands.append(fa._matmul(pt.astype(v.dtype),
                                     band(v, i)[:l]).astype(cdt))

    aq, a_s = _quantize_tile(jnp.concatenate(attn_bands, axis=1))
    acc = jax.lax.dot_general(aq, wo_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (a_s * so_ref[...])
    if residual:
        out = xf + out
    out_ref[0] = out.astype(out_ref.dtype)


def th_attention_sublayer_q8(x, scale, bias, wq, wk, wv, wo, m_pre,
                             m_post, num_heads, eps=LN_EPS,
                             residual=False):
    """Serving-only talking-heads span with int8 projections; same
    signature/param layout as :func:`th_attention_sublayer`. Falls back
    to the bf16 span when the unrolled-kernel geometry is unsupported
    (the blocked @384 path stays bf16). Not differentiable by design."""
    from sav_tpu.ops.quantized import quantize_symmetric

    b, l, dim = x.shape
    d_logical = wq.shape[2]
    if not th_supported(l, num_heads, d_logical):
        return th_attention_sublayer(x, scale, bias, wq, wk, wv, wo,
                                     m_pre, m_post, num_heads, eps,
                                     residual)
    dp = fa._round_up(d_logical, BAND)
    hd = num_heads * dp
    cdt = x.dtype
    wq_f, wk_f, wv_f, wo_f = _pad_weights(wq, wk, wv, wo, num_heads,
                                          d_logical, dp, jnp.float32)
    (wq_q, sq), (wk_q, sk), (wv_q, sv) = (
        quantize_symmetric(w, axis=0) for w in (wq_f, wk_f, wv_f))
    wo_q, so = quantize_symmetric(wo_f, axis=0)

    lp = max(fa._round_up(l, 16), 64)
    x_p = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0))) if lp != l else x
    row = lambda a: a.astype(jnp.float32).reshape(1, dim)
    x_spec = pl.BlockSpec((1, lp, dim), lambda bi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, dim), lambda bi: (0, 0),
                            memory_space=pltpu.VMEM)
    w_in_spec = pl.BlockSpec((dim, hd), lambda bi: (0, 0),
                             memory_space=pltpu.VMEM)
    s_in_spec = pl.BlockSpec((1, hd), lambda bi: (0, 0),
                             memory_space=pltpu.VMEM)
    w_out_spec = pl.BlockSpec((hd, dim), lambda bi: (0, 0),
                              memory_space=pltpu.VMEM)
    m_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    out = pl.pallas_call(
        functools.partial(_th_q8_kernel, l=l, heads=num_heads, dp=dp,
                          d_logical=d_logical, eps=eps, residual=residual),
        grid=(b,),
        in_specs=[x_spec, vec_spec, vec_spec, w_in_spec, s_in_spec,
                  w_in_spec, s_in_spec, w_in_spec, s_in_spec,
                  w_out_spec, vec_spec, m_spec, m_spec],
        out_specs=[x_spec],
        out_shape=[jax.ShapeDtypeStruct((b, lp, dim), cdt)],
        interpret=fa._interpret(),
    )(x_p, row(scale), row(bias), wq_q, sq, wk_q, sk, wv_q, sv,
      wo_q, row(so.reshape(-1)), m_pre.astype(jnp.float32),
      m_post.astype(jnp.float32))
    return out[0][:, :l]
