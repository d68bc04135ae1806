"""Attention sublayer under ONE custom_vjp boundary per layer.

Every previous kernel experiment (flash @224, hybrid, fused-qkv, int8) lost
end-to-end to the same ~2 ms/layer cost at the *per-op* custom_vjp
boundary (docs/PERFORMANCE.md round-2). This module moves the boundary to
the sublayer edge: the whole pre-LN attention sublayer of a ViT encoder
block —

    out = x + DenseGeneral_out(MHA(LayerNorm(x)))

(reference span: models/vit.py:21-27 + models/layers/attentions/
attention.py:29-63) — is one ``jax.custom_vjp`` whose forward and backward
mix XLA ops and Pallas kernels *inside*, with no differentiation boundary
between them. Residuals are flash-style for every core: ``(x, q, k, v,
attn, lse)`` — the ``[B, H, L, L]`` probability tensor XLA's default
backward keeps (89 MB at ViT-B @224 bs=192) is replaced by logsumexp rows,
and probabilities are recomputed in the backward.

Three cores, selected statically:
  * ``'xla'``    — everything jnp. Isolates the pure boundary + residual-
                   choice cost: the same ops XLA would run.
  * ``'flash'``  — attention core via the Pallas flash kernels
                   (``flash_attention._fwd``/``._bwd`` called directly, NOT
                   through their own custom_vjp); projections/LN stay XLA,
                   which round-2 probes measured at the machine ceiling
                   (175 TF/s; LN/gelu absorbed free).
  * ``'fused'``  — forward is one Pallas kernel spanning LN -> q/k/v
                   projections -> attention core -> output projection ->
                   residual add (one HBM read of x, one write of out, plus
                   the q/k/v/attn/lse residual writes); backward as
                   ``'flash'``. Requires single-block shapes
                   (``fused_supported``).

Weight-gradient GEMMs, LayerNorm backward, and the dy combination always
stay XLA: they are plain ``[BL, D]``-shaped ops XLA already runs at full
rate, and keeping them outside the kernels lets XLA fuse them freely
inside the one-boundary backward.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sav_tpu.ops import flash_attention as fa

CORES = ('xla', 'flash', 'fused')
LN_EPS = 1e-6


# ---------------------------------------------------------------- helpers

def _layernorm(x, scale, bias, eps):
    """Flax-compatible LayerNorm (fast variance, f32 stats).

    Returns (y in x.dtype, xhat f32, inv f32); xhat/inv feed the backward.
    """
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (xf - mu) * inv
    y = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype), xhat, inv


def _layernorm_bwd(dy, xhat, inv, scale):
    """(dx, dscale, dbias) of LayerNorm from saved normalized stats."""
    dyf = dy.astype(jnp.float32)
    dscale = jnp.sum(dyf * xhat, axis=(0, 1))
    dbias = jnp.sum(dyf, axis=(0, 1))
    dxhat = dyf * scale.astype(jnp.float32)
    dx = inv * (dxhat
                - jnp.mean(dxhat, axis=-1, keepdims=True)
                - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    return dx, dscale, dbias


def _project_qkv(y, wq, wk, wv, num_heads, head_d):
    """q (pre-scaled), k, v as [B, L, H, d] from [D, H, d] kernels."""
    b, l, dim = y.shape
    hd = num_heads * head_d
    cdt = y.dtype
    sc = jnp.asarray(1.0 / jnp.sqrt(head_d), cdt)
    qs = ((y @ wq.reshape(dim, hd).astype(cdt)) * sc)
    k = y @ wk.reshape(dim, hd).astype(cdt)
    v = y @ wv.reshape(dim, hd).astype(cdt)
    reshape = lambda a: a.reshape(b, l, num_heads, head_d)
    return reshape(qs), reshape(k), reshape(v)


def _pack_pad(x4, pad_to):
    """[B, L, H, d] -> packed [B, pad_to, H*d] (the flash kernel layout)."""
    b, l, h, d = x4.shape
    x = x4.reshape(b, l, h * d)
    if pad_to != l:
        x = jnp.pad(x, ((0, 0), (0, pad_to - l), (0, 0)))
    return x


def _xla_core(qs, k, v):
    """XLA attention core on [B, L, H, d] (q pre-scaled) -> (attn, lse)."""
    logits = jnp.einsum('bqhd,bkhd->bhqk', qs, k,
                        preferred_element_type=jnp.float32)
    lse = jax.scipy.special.logsumexp(logits, axis=-1)        # [B, H, L]
    p = jnp.exp(logits - lse[..., None]).astype(v.dtype)
    return jnp.einsum('bhqk,bkhd->bqhd', p, v), lse


def fused_supported(l: int, num_heads: int, head_d: int) -> bool:
    """'fused' needs single-block flash shapes (one q block, one kv block)
    and 64-lane head bands; falls back to 'flash' otherwise."""
    if head_d % fa.BAND or head_d > 256:
        return False
    block_q, block_k = fa._block_sizes(l, l, num_heads, head_d)
    return (fa._round_up(l, block_q) == block_q
            and fa._round_up(l, block_k) == block_k)


# --------------------------------------------------- fused forward kernel

def _fused_fwd_kernel(x_ref, scale_ref, bias_ref, wq_ref, wk_ref, wv_ref,
                      wo_ref, out_ref, *res_refs, l: int, heads: int,
                      d: int, eps: float, residual: bool,
                      pre_ln: bool = True):
    save_res = bool(res_refs)
    if save_res:
        q_ref, k_ref, v_ref, attn_ref, lse_ref = res_refs
    xf = x_ref[0].astype(jnp.float32)                    # [Lpad, D]
    if pre_ln:
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
        xhat = (xf - mu) * jax.lax.rsqrt(var + eps)
        y = (xhat * scale_ref[0] + bias_ref[0]).astype(x_ref.dtype)
    else:
        y = x_ref[0]

    sc = 1.0 / (d ** 0.5)
    q = (fa._matmul(y, wq_ref[...]) * sc).astype(x_ref.dtype)
    k = fa._matmul(y, wk_ref[...]).astype(x_ref.dtype)
    v = fa._matmul(y, wv_ref[...]).astype(x_ref.dtype)
    if save_res:
        q_ref[0] = q
        k_ref[0] = k
        v_ref[0] = v

    attn_bands = []
    for h in range(heads):
        qh = q[:, h * d:(h + 1) * d]
        kh = k[:, h * d:(h + 1) * d]
        vh = v[:, h * d:(h + 1) * d]
        # single-block fast path, same slicing discipline as
        # flash_attention._fwd_kernel: logits sliced to the true length, so
        # padding columns never reach the softmax or the PV matmul
        s = fa._qk(qh, kh)[:, :l]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        lsum = jnp.sum(p, axis=1, keepdims=True)
        band = (fa._matmul(p.astype(vh.dtype), vh[:l]) / lsum
                ).astype(x_ref.dtype)
        if save_res:
            attn_ref[0, :, h * d:(h + 1) * d] = band.astype(attn_ref.dtype)
            lse_ref[0, h] = jnp.broadcast_to(m + jnp.log(lsum),
                                             lse_ref.shape[2:])
        else:
            attn_bands.append(band)

    attn = (attn_ref[0].astype(x_ref.dtype) if save_res
            else jnp.concatenate(attn_bands, axis=1))
    out = fa._matmul(attn, wo_ref[...])
    if residual:
        out = xf + out
    out_ref[0] = out.astype(out_ref.dtype)


def _fused_fwd(x, scale, bias, wq, wk, wv, wo, num_heads, head_d, eps,
               residual, pre_ln=True, save_residuals=True):
    """One-kernel forward. Returns (out, (qp, kp, vp, attn_p, lse)).

    ``save_residuals=False`` (the non-differentiated primal: inference
    and eval) skips the five backward-residual outputs — q/k/v/attn/lse
    never leave VMEM, deleting 4x [B, Lpad, H*d] + lse of HBM stores per
    layer. Arithmetic is identical; returns (out, None)."""
    b, l, dim = x.shape
    hd = num_heads * head_d
    cdt = x.dtype
    block_q, _ = fa._block_sizes(l, l, num_heads, head_d)
    # one shared padded length for q and kv; >= 64 so the flash backward's
    # 64-lane kv block alignment always has a valid block
    l_pad = max(fa._round_up(l, block_q), 64)
    if l_pad != l:
        x_p = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
    else:
        x_p = x

    if not pre_ln:          # dummy [1, D] rows; the kernel never reads them
        scale = jnp.ones((dim,), jnp.float32)
        bias = jnp.zeros((dim,), jnp.float32)
    row = lambda a: a.astype(jnp.float32).reshape(1, dim)
    wq_f = wq.reshape(dim, hd).astype(cdt)
    wk_f = wk.reshape(dim, hd).astype(cdt)
    wv_f = wv.reshape(dim, hd).astype(cdt)
    wo_f = wo.reshape(hd, dim).astype(cdt)

    x_spec = pl.BlockSpec((1, l_pad, dim), lambda bi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    hd_spec = pl.BlockSpec((1, l_pad, hd), lambda bi: (bi, 0, 0),
                           memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, dim), lambda bi: (0, 0),
                            memory_space=pltpu.VMEM)
    w_in_spec = pl.BlockSpec((dim, hd), lambda bi: (0, 0),
                             memory_space=pltpu.VMEM)
    w_out_spec = pl.BlockSpec((hd, dim), lambda bi: (0, 0),
                              memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, num_heads, l_pad, fa.STAT_LANES),
                            lambda bi: (bi, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    out_specs = [x_spec]
    out_shape = [jax.ShapeDtypeStruct((b, l_pad, dim), cdt)]
    if save_residuals:
        out_specs += [hd_spec, hd_spec, hd_spec, hd_spec, lse_spec]
        out_shape += [
            jax.ShapeDtypeStruct((b, l_pad, hd), cdt),
            jax.ShapeDtypeStruct((b, l_pad, hd), cdt),
            jax.ShapeDtypeStruct((b, l_pad, hd), cdt),
            jax.ShapeDtypeStruct((b, l_pad, hd), cdt),
            jax.ShapeDtypeStruct((b, num_heads, l_pad, fa.STAT_LANES),
                                 jnp.float32),
        ]
    outs = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, l=l, heads=num_heads,
                          d=head_d, eps=eps, residual=residual,
                          pre_ln=pre_ln),
        grid=(b,),
        in_specs=[x_spec, vec_spec, vec_spec, w_in_spec, w_in_spec,
                  w_in_spec, w_out_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=fa._interpret(),
        **fa._cparams(num_heads, l_pad, l_pad),
    )(x_p, row(scale), row(bias), wq_f, wk_f, wv_f, wo_f)
    if not save_residuals:
        return outs[0][:, :l], None
    out, qp, kp, vp, attn_p, lse = outs
    return out[:, :l], (qp, kp, vp, attn_p, lse, l_pad, l_pad)


# ------------------------------------------------------------- custom_vjp

def _forward(x, scale, bias, wq, wk, wv, wo, num_heads, core, eps,
             residual, rotary=False, pre_ln=True, save_residuals=True):
    b, l, dim = x.shape
    head_d = wq.shape[2]
    hd = num_heads * head_d
    cdt = x.dtype

    if rotary and core == 'fused':
        core = 'flash'          # rotation is not in the fused kernel (yet)
    if core == 'fused':
        out, residual_core = _fused_fwd(x, scale, bias, wq, wk, wv, wo,
                                        num_heads, head_d, eps, residual,
                                        pre_ln, save_residuals)
        return out, residual_core

    y = x if not pre_ln else _layernorm(x, scale, bias, eps)[0]
    qs, k, v = _project_qkv(y, wq, wk, wv, num_heads, head_d)
    if rotary:
        # rotate q/k post-projection (nn/posembed.py, ViT pos_embed='rotary')
        from sav_tpu.nn.posembed import apply_rotary_heads, sincos_frequencies
        freqs = sincos_frequencies(l, head_d)
        qs = apply_rotary_heads(qs, freqs)
        k = apply_rotary_heads(k, freqs)

    if core == 'xla':
        attn, lse = _xla_core(qs, k, v)
        residual_core = (qs, k, v, attn, lse)
    elif core == 'flash':
        block_q, block_k = fa._block_sizes(l, l, num_heads, head_d)
        q_pad = fa._round_up(l, block_q)
        kv_pad = fa._round_up(l, block_k)
        qp = _pack_pad(qs, q_pad)
        kp = _pack_pad(k, kv_pad)
        vp = _pack_pad(v, kv_pad)
        outp, lse = fa._fwd(qp, kp, vp, heads=num_heads, block_q=block_q,
                            block_k=block_k, kv_len=l)
        attn = outp[:, :l].reshape(b, l, num_heads, head_d)
        residual_core = (qp, kp, vp, outp, lse, block_q, block_k)
    else:
        raise ValueError(f'core must be one of {CORES}, got {core!r}')

    out = attn.reshape(b, l, hd) @ wo.reshape(hd, dim).astype(cdt)
    if residual:
        out = x + out
    return out, residual_core


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def attention_sublayer(x, scale, bias, wq, wk, wv, wo, num_heads,
                       core='flash', eps=LN_EPS, residual=True,
                       rotary=False):
    """``x + W_o @ MHA(LN(x))`` with one custom_vjp for the whole span.

    Args:
      x: ``[B, L, D]`` activations.
      scale, bias: LayerNorm parameters ``[D]``.
      wq, wk, wv: projection kernels ``[D, H, d]`` (checkpoint layout).
      wo: merged output kernel ``[H, d, D]``.
      num_heads, core, eps, residual: static; ``core`` in ``CORES``.
        ``residual=False`` returns the sublayer output WITHOUT adding x —
        for blocks whose skip connection bypasses the LN input (TNT's
        outer transformer adds the pre-bridge patch embeddings,
        reference tnt.py:77-85). ``rotary=True`` rotates q/k after
        projection (ViT ``pos_embed='rotary'``); the rotation also runs
        inside the boundary.
    """
    # primal (non-differentiated) call: inference and eval never need the
    # backward residuals, so the fused kernel skips their HBM stores
    out, _ = _forward(x, scale, bias, wq, wk, wv, wo, num_heads, core, eps,
                      residual, rotary, save_residuals=False)
    return out


def _sublayer_fwd(x, scale, bias, wq, wk, wv, wo, num_heads, core, eps,
                  residual, rotary):
    out, residual_core = _forward(x, scale, bias, wq, wk, wv, wo,
                                  num_heads, core, eps, residual, rotary)
    return out, (x, scale, bias, wq, wk, wv, wo, residual_core)


def _sublayer_bwd(num_heads, core, eps, residual, rotary, saved, g,
                  pre_ln=True):
    if rotary and core == 'fused':
        core = 'flash'          # mirrors the forward's downgrade
    x, scale, bias, wq, wk, wv, wo, residual_core = saved
    b, l, dim = x.shape
    head_d = wq.shape[2]
    hd = num_heads * head_d
    cdt = x.dtype
    sc = jnp.asarray(1.0 / jnp.sqrt(head_d), cdt)
    wo_f = wo.reshape(hd, dim).astype(cdt)
    g_c = g.astype(cdt)

    if core == 'xla':
        qs4, k4, v4, attn4, lse = residual_core
        attn_f = attn4.reshape(b, l, hd)
    else:
        qp, kp, vp, outp, lse, block_q, block_k = residual_core
        attn_f = outp[:, :l]

    # output projection backward (XLA GEMMs)
    d_attn = jnp.einsum('bld,cd->blc', g_c, wo_f)              # [B, L, HD]
    dwo = jnp.einsum('blc,bld->cd', attn_f, g_c,
                     preferred_element_type=jnp.float32)

    if core == 'xla':
        d_attn4 = d_attn.reshape(b, l, num_heads, head_d)
        s = jnp.einsum('bqhd,bkhd->bhqk', qs4, k4,
                       preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse[..., None])
        delta = jnp.einsum('bqhd,bqhd->bhq', attn4.astype(jnp.float32),
                           d_attn4.astype(jnp.float32))
        dp = jnp.einsum('bqhd,bkhd->bhqk', d_attn4, v4,
                        preferred_element_type=jnp.float32)
        ds = (p * (dp - delta[..., None])).astype(cdt)
        dq_f = (jnp.einsum('bhqk,bkhd->bqhd', ds, k4)
                * sc).reshape(b, l, hd)
        dk_f = jnp.einsum('bhqk,bqhd->bkhd', ds, qs4).reshape(b, l, hd)
        dv_f = jnp.einsum('bhqk,bqhd->bkhd', p.astype(cdt),
                          d_attn4).reshape(b, l, hd)
    else:
        q_pad = qp.shape[1]
        do_p = d_attn
        if q_pad != l:
            do_p = jnp.pad(do_p, ((0, 0), (0, q_pad - l), (0, 0)))
        dqs_p, dk_p, dv_p = fa._bwd(qp, kp, vp, outp, lse, do_p,
                                    heads=num_heads, block_q=block_q,
                                    block_k=block_k, kv_len=l)
        dq_f = dqs_p[:, :l] * sc                 # undo the q pre-scaling
        dk_f = dk_p[:, :l]
        dv_f = dv_p[:, :l]

    if rotary:
        # q/k were rotated AFTER projection; the rotation is orthogonal, so
        # the cotangent chains through the inverse rotation (negated table)
        from sav_tpu.nn.posembed import apply_rotary_heads, sincos_frequencies
        freqs = sincos_frequencies(l, head_d)
        unrot = lambda a: apply_rotary_heads(
            a.reshape(b, l, num_heads, head_d), -freqs).reshape(b, l, hd)
        dq_f = unrot(dq_f)
        dk_f = unrot(dk_f)

    # projection weight grads + dy; y is recomputed from x — XLA fuses the
    # LayerNorm into the GEMMs for free (round-2 probes, PERFORMANCE.md)
    if pre_ln:
        y, xhat, inv = _layernorm(x, scale, bias, eps)
    else:
        y = x
    dwq = jnp.einsum('bld,blc->dc', y, dq_f,
                     preferred_element_type=jnp.float32)
    dwk = jnp.einsum('bld,blc->dc', y, dk_f,
                     preferred_element_type=jnp.float32)
    dwv = jnp.einsum('bld,blc->dc', y, dv_f,
                     preferred_element_type=jnp.float32)
    dy = (jnp.einsum('blc,dc->bld', dq_f, wq.reshape(dim, hd).astype(cdt))
          + jnp.einsum('blc,dc->bld', dk_f, wk.reshape(dim, hd).astype(cdt))
          + jnp.einsum('blc,dc->bld', dv_f,
                       wv.reshape(dim, hd).astype(cdt)))

    if pre_ln:
        dx_ln, dscale, dbias = _layernorm_bwd(dy, xhat, inv, scale)
    else:
        dx_ln = dy.astype(jnp.float32)
    dx = (dx_ln + g.astype(jnp.float32)).astype(cdt) if residual \
        else dx_ln.astype(cdt)

    shape_w = (dim, num_heads, head_d)
    dws = (dwq.reshape(shape_w).astype(wq.dtype),
           dwk.reshape(shape_w).astype(wk.dtype),
           dwv.reshape(shape_w).astype(wv.dtype),
           dwo.reshape(num_heads, head_d, dim).astype(wo.dtype))
    if not pre_ln:
        return (dx,) + dws
    return (dx, dscale.astype(scale.dtype),
            dbias.astype(bias.dtype)) + dws


attention_sublayer.defvjp(_sublayer_fwd, _sublayer_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def attention_sublayer_noln(x, wq, wk, wv, wo, num_heads, core='flash',
                            residual=True):
    """``x + W_o @ MHA(x)`` — the POST-LN attention sublayer span (no
    LayerNorm inside; the norm follows the residual outside the boundary),
    under one custom_vjp. Serves CeiT's post-norm encoder blocks
    (reference: models/ceit.py:19-44, where attention consumes the raw
    block input). Same cores and residual policy as
    :func:`attention_sublayer`.
    """
    out, _ = _forward(x, None, None, wq, wk, wv, wo, num_heads, core,
                      LN_EPS, residual, pre_ln=False, save_residuals=False)
    return out


def _sublayer_noln_fwd(x, wq, wk, wv, wo, num_heads, core, residual):
    out, residual_core = _forward(x, None, None, wq, wk, wv, wo, num_heads,
                                  core, LN_EPS, residual, pre_ln=False)
    return out, (x, wq, wk, wv, wo, residual_core)


def _sublayer_noln_bwd(num_heads, core, residual, saved, g):
    x, wq, wk, wv, wo, residual_core = saved
    return _sublayer_bwd(num_heads, core, LN_EPS, residual, False,
                         (x, None, None, wq, wk, wv, wo, residual_core),
                         g, pre_ln=False)


attention_sublayer_noln.defvjp(_sublayer_noln_fwd, _sublayer_noln_bwd)


def auto_core(l: int, num_heads: int, head_ch: int):
    """Auto-dispatch predicate: the fused-sublayer core to use on this
    backend/shape, or None to stay on the per-op path.

    Measured end-to-end (ViT-B/16 bf16, v5e, round 3): @224 bs=192 the
    per-op path runs 193.5 ms/step vs 160.9 ms ('fused') / 166.0 ms
    ('flash'); docs/PERFORMANCE.md has the ladder, including the
    fused_layer_xla control showing the win comes from the Pallas cores
    plus the single boundary, not the boundary alone.
    """
    if jax.default_backend() != 'tpu':
        return None            # CPU interpret mode would be a slowdown
    if l < 64 or head_ch % fa.BAND or head_ch > 256:
        return None            # flash core's shape support envelope
    if fused_supported(l, num_heads, head_ch):
        return 'fused'
    # r5 receipt (benchmarks/vitl384_probe.py): at h=16 the raised
    # single block is excluded for backward-VMEM correctness
    # (flash_attention.py r5 fix), and the multi-block flash span then
    # LOSES to per-op XLA — vit_l @384 bs16: 82.4 img/s flash vs 91.1
    # XLA. The per-head unrolled logit liveness that pays at h<=12
    # degrades at 16 heads; route XLA there.
    if num_heads >= 16:
        return None
    return 'flash'


# ----------------------------------------- FF sublayer, fused backward

# Round 2 closed "fused FF backward" as VMEM-capacity-bound: keeping
# dh = (dy @ W2') * gelu'(hpre) in VMEM for both its consumers needs
# W1+W2 (9.4 MB bf16) + f32 dW accumulators (9.4 MB each) resident —
# 28.2 MB against what was then believed to be a hard 16 MB scoped-VMEM
# wall. Round 3 found the wall is a per-kernel DEFAULT
# (pltpu.CompilerParams(vmem_limit_bytes=...); v5e has 128 MB physical),
# which reopens the design: one Pallas kernel walks row blocks of the
# flattened [M, D] cotangent, keeps dh/h in VMEM, accumulates dW1/dW2 in
# f32 scratch and flushes them on the last block. The forward stays XLA
# (measured at its bandwidth ceiling, round-2 probes); only the backward
# — where the dh materialization traffic lives — is replaced.
#
# MEASURED OUTCOME (round 3, benchmarks/ff_bwd_probe.py): it LOSES —
# 10.56 ms/layer fwd+bwd vs XLA's 7.39 at ViT-B @224 bs192 shapes
# (11.45 at 512-row blocks); standalone XLA is within ~10% of the
# pure-GEMM bound, so there was no dh headroom to recover, and the
# serialized dW accumulation denies Mosaic cross-step pipelining.
# Kept OPT-IN (`use_kernel='fused_ff'`) as an equality-tested receipt.
# tanh-approximation constants of jax.nn.gelu(approximate=True)
_GELU_C = 0.7978845608028654        # sqrt(2/pi)
_GELU_A = 0.044715

_FF_VMEM_CEIL = 100 * 1024 * 1024   # of v5e's 128 MB physical VMEM


def _ff_geometry(dim: int, hidden: int):
    """(block_rows, vmem_limit_bytes) for the fused FF backward, or None.

    Weights (bf16) + f32 dW accumulators are resident; row blocks and
    their f32 transients (dgact/dh/t...) scale with block_rows. The
    per-kernel limit is sized to the footprint plus pipelining headroom,
    capped well under the 128 MB physical VMEM.
    """
    fixed = dim * hidden * (2 + 2 + 4 + 4)      # W bf16 + dW f32, both mats
    for bm in (256, 128):
        rows = bm * (4 * dim + 10 * hidden)     # blocks + transients
        need = fixed + rows + 14 * 1024 * 1024  # headroom (scan adds ~2MB)
        if need <= _FF_VMEM_CEIL:
            return bm, need
    return None


def ff_kernel_supported(dim: int, hidden: int) -> bool:
    return _ff_geometry(dim, hidden) is not None


def _ff_bwd_kernel(g_ref, hpre_ref, y_ref, w1_ref, w2_ref,
                   dy_ref, dw1_ref, dw2_ref, db1_ref):
    mi = pl.program_id(0)

    g = g_ref[...]
    hp = hpre_ref[...].astype(jnp.float32)

    dgact = fa._qk(g, w2_ref[...])                       # [bm, F] f32
    u = _GELU_C * (hp + _GELU_A * hp * hp * hp)
    t = jnp.tanh(u)
    dgelu = 0.5 * (1.0 + t) + 0.5 * hp * (1.0 - t * t) * _GELU_C * (
        1.0 + 3.0 * _GELU_A * hp * hp)
    dh32 = dgact * dgelu
    dh = dh32.astype(g.dtype)
    h = (0.5 * hp * (1.0 + t)).astype(g.dtype)           # gelu(hpre)

    @pl.when(mi == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    dw2_ref[...] += fa._matmul_tn(h, g)                  # [F, D]
    dw1_ref[...] += fa._matmul_tn(y_ref[...], dh)        # [D, F]
    dy_ref[...] = fa._qk(dh, w1_ref[...]).astype(dy_ref.dtype)
    # (1, F) blocks are not lowerable (sublane must be 8-divisible);
    # broadcast the row sum over an 8-sublane tile, de-duplicated outside
    db1_ref[0] = jnp.broadcast_to(jnp.sum(dh32, axis=0, keepdims=True),
                                  db1_ref.shape[1:])


def _ff_bwd_pallas(g2, hpre2, y2, w1_f, w2_f):
    """g2/y2 [M, D], hpre2 [M, F] (flattened rows). Returns
    (dy2 [M, D], dw1 [D, F] f32, dw2 [F, D] f32, db1 [F] f32)."""
    m, dim = g2.shape
    hidden = hpre2.shape[1]
    geometry = _ff_geometry(dim, hidden)
    if geometry is None:
        raise ValueError(
            f'fused FF backward unsupported at dim={dim} hidden={hidden}: '
            f'weights + dW accumulators exceed the VMEM ceiling '
            f'(check ff_kernel_supported before routing)')
    bm, vmem_limit = geometry
    mp = fa._round_up(m, bm)
    if mp != m:
        # zero rows are exact: dh rows are zero (dgact zero), so dW/db
        # take no contribution and the dy2 rows are sliced off below
        pad = lambda a: jnp.pad(a, ((0, mp - m), (0, 0)))
        g2, hpre2, y2 = pad(g2), pad(hpre2), pad(y2)
    nm = mp // bm

    d_spec = pl.BlockSpec((bm, dim), lambda mi: (mi, 0),
                          memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((bm, hidden), lambda mi: (mi, 0),
                          memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((dim, hidden), lambda mi: (0, 0),
                           memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((hidden, dim), lambda mi: (0, 0),
                           memory_space=pltpu.VMEM)
    db_spec = pl.BlockSpec((1, 8, hidden), lambda mi: (mi, 0, 0),
                           memory_space=pltpu.VMEM)

    dy2, dw1, dw2, db1_p = pl.pallas_call(
        _ff_bwd_kernel,
        grid=(nm,),
        in_specs=[d_spec, f_spec, d_spec, w1_spec, w2_spec],
        out_specs=[d_spec, w1_spec, w2_spec, db_spec],
        out_shape=[
            jax.ShapeDtypeStruct((mp, dim), g2.dtype),
            jax.ShapeDtypeStruct((dim, hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, dim), jnp.float32),
            jax.ShapeDtypeStruct((nm, 8, hidden), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit),
        interpret=fa._interpret(),
    )(g2, hpre2, y2, w1_f, w2_f)
    return dy2[:m], dw1, dw2, jnp.sum(db1_p[:, 0], axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def ff_sublayer(x, scale2, bias2, w1, b1, w2, b2, eps=LN_EPS,
                residual=True):
    """``x + W2 @ gelu(W1 @ LN(x) + b1) + b2`` with the XLA forward and
    the Pallas fused backward (reference ff.py:8-34 semantics).

    ``residual=False`` returns the sublayer output WITHOUT adding x —
    for blocks that scale/drop the branch before the skip connection
    (CaiT's LayerScale + stochastic depth, reference cait.py:18-53)."""
    out, _ = _ff_fwd_res(x, scale2, bias2, w1, b1, w2, b2, eps, residual)
    return out


def _ff_fwd_res(x, scale2, bias2, w1, b1, w2, b2, eps, residual):
    cdt = x.dtype
    y2, _, _ = _layernorm(x, scale2, bias2, eps)
    hpre = y2 @ w1.astype(cdt) + b1.astype(cdt)
    out = jax.nn.gelu(hpre) @ w2.astype(cdt) + b2.astype(cdt)
    if residual:
        out = x + out
    return out, hpre


def _ff_sublayer_fwd(x, scale2, bias2, w1, b1, w2, b2, eps, residual):
    out, hpre = _ff_fwd_res(x, scale2, bias2, w1, b1, w2, b2, eps,
                            residual)
    return out, (x, scale2, bias2, w1, b1, w2, b2, hpre)


def _ff_sublayer_bwd(eps, residual, saved, g):
    x, scale2, bias2, w1, b1, w2, b2, hpre = saved
    b, l, dim = x.shape
    hidden = w1.shape[1]
    cdt = x.dtype
    g_c = g.astype(cdt)

    y2, xhat2, inv2 = _layernorm(x, scale2, bias2, eps)
    dy2_f, dw1, dw2, db1 = _ff_bwd_pallas(
        g_c.reshape(b * l, dim), hpre.reshape(b * l, hidden),
        y2.reshape(b * l, dim), w1.astype(cdt), w2.astype(cdt))
    dy2 = dy2_f.reshape(b, l, dim)
    db2 = jnp.sum(g.astype(jnp.float32), axis=(0, 1))

    dx_ln, dscale2, dbias2 = _layernorm_bwd(dy2, xhat2, inv2, scale2)
    dx = (dx_ln + g.astype(jnp.float32)).astype(cdt) if residual \
        else dx_ln.astype(cdt)
    return (dx, dscale2.astype(scale2.dtype), dbias2.astype(bias2.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


ff_sublayer.defvjp(_ff_sublayer_fwd, _ff_sublayer_bwd)


# ------------------------------------------- whole-encoder-layer custom_vjp

def _ff_forward(a, scale2, bias2, w1, b1, w2, b2, eps):
    """a + Dense_1(gelu(Dense_0(LN(a)))) in a.dtype (FFBlock semantics,
    reference ff.py:8-34)."""
    cdt = a.dtype
    y2, _, _ = _layernorm(a, scale2, bias2, eps)
    h = y2 @ w1.astype(cdt) + b1.astype(cdt)
    f = jax.nn.gelu(h) @ w2.astype(cdt) + b2.astype(cdt)
    return a + f


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def encoder_layer(x, scale1, bias1, wq, wk, wv, wo, scale2, bias2, w1, b1,
                  w2, b2, num_heads, core, eps):
    """A full pre-LN encoder layer — attention sublayer + FF sublayer
    (reference vit.py:19-32) — under ONE custom_vjp boundary.

    Halves the boundary count of ``attention_sublayer`` (one per LAYER,
    not per sublayer) and swaps XLA's FF residual policy for flash-style
    recompute: the pre-gelu hidden activations ``[B, L, 4D]`` (232 MB at
    ViT-B @224 bs=192) are NOT saved — the backward recomputes them from
    the attention output with one extra GEMM. Attention core per ``core``
    as in :func:`attention_sublayer`.
    """
    a, _ = _forward(x, scale1, bias1, wq, wk, wv, wo, num_heads, core, eps,
                    True, save_residuals=False)
    return _ff_forward(a, scale2, bias2, w1, b1, w2, b2, eps)


def _encoder_fwd(x, scale1, bias1, wq, wk, wv, wo, scale2, bias2, w1, b1,
                 w2, b2, num_heads, core, eps):
    a, residual_core = _forward(x, scale1, bias1, wq, wk, wv, wo, num_heads,
                                core, eps, True)
    out = _ff_forward(a, scale2, bias2, w1, b1, w2, b2, eps)
    return out, (x, scale1, bias1, wq, wk, wv, wo, residual_core, a,
                 scale2, bias2, w1, b1, w2, b2)


def _encoder_bwd(num_heads, core, eps, saved, g):
    (x, scale1, bias1, wq, wk, wv, wo, residual_core, a, scale2, bias2,
     w1, b1, w2, b2) = saved
    cdt = a.dtype
    g_c = g.astype(cdt)

    # FF backward, hidden activations recomputed from a (one extra GEMM
    # instead of a [B, L, 4D] residual)
    y2, xhat2, inv2 = _layernorm(a, scale2, bias2, eps)
    w1c, w2c = w1.astype(cdt), w2.astype(cdt)
    h = y2 @ w1c + b1.astype(cdt)
    gact, gelu_vjp = jax.vjp(jax.nn.gelu, h)
    dgact = jnp.einsum('bld,hd->blh', g_c, w2c)
    dw2 = jnp.einsum('blh,bld->hd', gact, g_c,
                     preferred_element_type=jnp.float32)
    db2 = jnp.sum(g.astype(jnp.float32), axis=(0, 1))
    dh = gelu_vjp(dgact)[0]
    dw1 = jnp.einsum('bld,blh->dh', y2, dh,
                     preferred_element_type=jnp.float32)
    db1 = jnp.sum(dh.astype(jnp.float32), axis=(0, 1))
    dy2 = jnp.einsum('blh,dh->bld', dh, w1c)
    da_ln, dscale2, dbias2 = _layernorm_bwd(dy2, xhat2, inv2, scale2)
    da = (da_ln + g.astype(jnp.float32)).astype(cdt)

    att = _sublayer_bwd(num_heads, core, eps, True, False,
                        (x, scale1, bias1, wq, wk, wv, wo, residual_core),
                        da)
    return att + (dscale2.astype(scale2.dtype),
                  dbias2.astype(bias2.dtype),
                  dw1.astype(w1.dtype),
                  db1.astype(b1.dtype),
                  dw2.astype(w2.dtype),
                  db2.astype(b2.dtype))


encoder_layer.defvjp(_encoder_fwd, _encoder_bwd)


# ------------------- int8 serving forward: projections quantized in-kernel
#
# Inference-only extension of the lean primal above: the four projection
# GEMMs (q/k/v/out — ~31% of a ViT-B layer's forward FLOPs) run int8 with
# int32 MXU accumulation, per-row activation scales computed in VMEM and
# per-column weight scales computed once outside. The attention core
# (logits/softmax/PV) stays bf16/f32 — its FLOPs are small and its
# numerics matter. No custom_vjp: this path is for serving
# (predict.py --quantized all); differentiating through it fails loudly.


def _fused_infer_q8_kernel(x_ref, scale_ref, bias_ref, wq_ref, sq_ref,
                           wk_ref, sk_ref, wv_ref, sv_ref, wo_ref, so_ref,
                           out_ref, *, l: int, heads: int, d: int,
                           eps: float, residual: bool):
    from sav_tpu.ops.int8_matmul_kernel import _quantize_tile

    xf = x_ref[0].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + eps) * scale_ref[0] + bias_ref[0]

    yq, ys = _quantize_tile(y)      # ONE row quantization feeds q, k, v
    cdt = x_ref.dtype

    def proj(w_ref, s_ref):
        acc = jax.lax.dot_general(yq, w_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (ys * s_ref[...])

    sc = 1.0 / (d ** 0.5)
    q = (proj(wq_ref, sq_ref) * sc).astype(cdt)
    k = proj(wk_ref, sk_ref).astype(cdt)
    v = proj(wv_ref, sv_ref).astype(cdt)

    attn_bands = []
    for h in range(heads):
        qh = q[:, h * d:(h + 1) * d]
        kh = k[:, h * d:(h + 1) * d]
        vh = v[:, h * d:(h + 1) * d]
        s = fa._qk(qh, kh)[:, :l]
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        lsum = jnp.sum(p, axis=1, keepdims=True)
        attn_bands.append((fa._matmul(p.astype(vh.dtype), vh[:l]) / lsum
                           ).astype(cdt))

    aq, a_s = _quantize_tile(jnp.concatenate(attn_bands, axis=1))
    acc = jax.lax.dot_general(aq, wo_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (a_s * so_ref[...])
    if residual:
        out = xf + out
    out_ref[0] = out.astype(out_ref.dtype)


def _q8_weights(wq, wk, wv, wo, dim, hd):
    from sav_tpu.ops.quantized import quantize_symmetric
    qs = [quantize_symmetric(w.reshape(dim, hd).astype(jnp.float32),
                             axis=0) for w in (wq, wk, wv)]
    oq, so = quantize_symmetric(wo.reshape(hd, dim).astype(jnp.float32),
                                axis=0)
    return qs + [(oq, so)]


def attention_sublayer_q8(x, scale, bias, wq, wk, wv, wo, num_heads,
                          eps=LN_EPS, residual=True):
    """Serving-only ``x + W_o @ MHA(LN(x))`` with int8 projections.

    Same signature/param layout as :func:`attention_sublayer` (minus the
    core choice). Falls back to the bf16 primal when the fused-kernel
    geometry is unsupported. Not differentiable by design.
    """
    b, l, dim = x.shape
    head_d = wq.shape[2]
    if not fused_supported(l, num_heads, head_d):
        return attention_sublayer(x, scale, bias, wq, wk, wv, wo,
                                  num_heads, core='flash', eps=eps,
                                  residual=residual)
    hd = num_heads * head_d
    cdt = x.dtype
    block_q, _ = fa._block_sizes(l, l, num_heads, head_d)
    l_pad = max(fa._round_up(l, block_q), 64)
    x_p = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0))) if l_pad != l else x

    (wq_q, sq), (wk_q, sk), (wv_q, sv), (wo_q, so) = _q8_weights(
        wq, wk, wv, wo, dim, hd)
    row = lambda a: a.astype(jnp.float32).reshape(1, dim)

    x_spec = pl.BlockSpec((1, l_pad, dim), lambda bi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, dim), lambda bi: (0, 0),
                            memory_space=pltpu.VMEM)
    w_in_spec = pl.BlockSpec((dim, hd), lambda bi: (0, 0),
                             memory_space=pltpu.VMEM)
    s_in_spec = pl.BlockSpec((1, hd), lambda bi: (0, 0),
                             memory_space=pltpu.VMEM)
    w_out_spec = pl.BlockSpec((hd, dim), lambda bi: (0, 0),
                              memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_fused_infer_q8_kernel, l=l, heads=num_heads,
                          d=head_d, eps=eps, residual=residual),
        grid=(b,),
        in_specs=[x_spec, vec_spec, vec_spec, w_in_spec, s_in_spec,
                  w_in_spec, s_in_spec, w_in_spec, s_in_spec,
                  w_out_spec, vec_spec],
        out_specs=[x_spec],
        out_shape=[jax.ShapeDtypeStruct((b, l_pad, dim), cdt)],
        interpret=fa._interpret(),
        **fa._cparams(num_heads, l_pad, l_pad),
    )(x_p, row(scale), row(bias), wq_q, sq, wk_q, sk, wv_q, sv, wo_q,
      row(so.reshape(-1)))
    return out[0][:, :l]
