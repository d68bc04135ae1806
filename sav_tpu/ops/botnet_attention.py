"""Fused BoTNet relative-position attention core (Pallas, TPU).

OPT-IN (``use_kernel='botnet_fused'``), not auto-routed: measured a
tie-to-loss against XLA at botnet_t3 stage shapes
(``benchmarks/botnet_region_probe.py`` fwd+bwd, B=64 14x14 grid:
plain SA 1.57, XLA SA+rel 2.07, XLA SA+rel-tiled-6d 2.09, this kernel
2.15 ms/layer; nb=4 image batching 2.31). The rel-pos bias does cost
~0.5 ms/layer of HBM round-trips in the XLA path, but at this region
size (12.5k rows) the single custom_vjp boundary costs the same — the
mechanism that closed flash @224 (docs/PERFORMANCE.md round-2). The
kernel stays as the measured receipt and for larger-grid BoT variants.

Design (what the kernel does): keeps the decomposed per-axis logits
``rel_h/rel_w [B, h, L, G]`` (G = grid side, L = G*G) as the only
HBM-resident bias state and expands them to the full ``[L, L]`` map
inside VMEM via two tiny constant 0/1 matmuls::

    bias[q, j] = rel_h[q, j // G] + rel_w[q, j % G]
              = (rel_h @ E_h + rel_w @ E_w)[q, j],
    E_h[p, j] = [j // G == p],   E_w[w, j] = [j % G == w]

The skew trick (relative -> absolute offsets) and the ``q . emb``
einsums stay in XLA on ``[B, h, L, 2G-1]`` tensors — tiny, and their
VJPs come free from autodiff; the custom_vjp boundary wraps only the
attention core, so the whole sublayer pays ONE Pallas boundary
(the round-3 lesson: the boundary tax is per boundary).

Reference match: /root/reference/models/botnet.py:70-141
(RelativeLogits), 144-199 (BoTMHSA). The reference tiles the bias to
full 6-D per axis (botnet.py:108-110) — measured within noise of the
broadcast-add XLA lane here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from einops import rearrange
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sav_tpu.ops import flash_attention as fa

NEG_INF = -1e30


def _cparams():
    # Per-kernel scoped-VMEM raise: the nb-batched backward's Mosaic
    # stack measured 21.1 MB against the 16 MB default (per-kernel
    # adjustable; v5e has 128 MB physical).
    if fa._interpret():
        return {}
    return dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=fa._RAISED_LIMIT))


def supported(g: int, num_heads: int, head_d: int) -> bool:
    """Single-block geometry: the whole [L, L] map per head in VMEM."""
    if head_d % fa.BAND or head_d > 256:
        return False
    if num_heads > 16 or g < 4 or g > 28:       # g=28 -> L=784
        return False
    return True


def relative_shift(rel_logits):
    """Skews ``[B, h, L, 2L-1]`` relative logits into absolute ``[B,h,L,L]``.

    Standard pad-reshape-slice trick (reference: models/botnet.py:77-93).
    Row q, column k ends up holding the logit for relative offset ``k - q``.
    """
    b, h, length, _ = rel_logits.shape
    x = jnp.pad(rel_logits, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = rearrange(x, 'b h l v -> b h (l v)')
    x = jnp.pad(x, ((0, 0), (0, 0), (0, length - 1)))
    x = rearrange(x, 'b h (l v) -> b h l v', l=length + 1)
    return x[:, :, :length, length - 1:]


def decomposed_rel_logits(qs, emb_h, emb_w, num_heads: int, g: int):
    """Per-axis rel-pos logits from a scaled query in band layout.

    qs: ``[B, L, h*d]`` (L = g*g, row-major over the (H, W) grid).
    Returns ``(rel_h, rel_w)`` each ``[B, h, L, g]`` f32:
    ``rel_h[.., (H, W), P]`` is the height-offset term (key row P),
    ``rel_w[.., (H, W), Q]`` the width-offset term (key column Q).
    Matches the reference's RelativeLogits up to the (broadcast) sum.
    """
    q5 = rearrange(qs, 'b (H W) (h d) -> b h H W d', H=g, h=num_heads)

    def one_axis(q5_axis, emb):
        x = jnp.einsum('bhHWd,md->bhHWm', q5_axis, emb)
        x = rearrange(x, 'b h H W m -> b (h H) W m')
        x = relative_shift(x)
        return rearrange(x, 'b (h H) W V -> b h H W V', H=g)

    rel_w = one_axis(q5, emb_w)                              # [B,h,H,W,Q]
    rel_h = rearrange(one_axis(rearrange(q5, 'b h H W d -> b h W H d'),
                               emb_h), 'b h W H P -> b h H W P')
    flat = lambda r: rearrange(r, 'b h H W V -> b h (H W) V').astype(
        jnp.float32)
    return flat(rel_h), flat(rel_w)


def _expanders(g: int, width: int, dtype):
    """E_h, E_w: [g, width] 0/1 expansion matrices (see module docstring).

    Columns j >= g*g (padding) are all-zero for E_h automatically
    (j // g >= g); E_w columns there may be nonzero — callers mask or
    slice padded key columns before the softmax.
    """
    j = jax.lax.broadcasted_iota(jnp.int32, (g, width), 1)
    p = jax.lax.broadcasted_iota(jnp.int32, (g, width), 0)
    e_h = (j // g == p).astype(dtype)
    e_w = (j % g == p).astype(dtype)
    return e_h, e_w


# ------------------------------------------------------------ kernels

def _fwd_kernel(qs_ref, k_ref, v_ref, rh_ref, rw_ref, out_ref, lse_ref,
                *, l: int, heads: int, d: int, g: int, nb: int):
    e_h, e_w = _expanders(g, l, jnp.float32)
    for i in range(nb):         # unrolled images AND heads: Mosaic
        for h in range(heads):  # software-pipelines across the matmuls
            band = slice(h * d, (h + 1) * d)
            qh = qs_ref[i][:, band]
            kh = k_ref[i][:, band]
            vh = v_ref[i][:, band]
            # logits sliced to the true kv length: padding columns never
            # reach the softmax (same discipline as fused_layer)
            s = fa._qk(qh, kh)[:, :l]
            s = s + fa._matmul(rh_ref[i, h], e_h) + fa._matmul(
                rw_ref[i, h], e_w)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            lsum = jnp.sum(p, axis=1, keepdims=True)
            o = (fa._matmul(p.astype(vh.dtype), vh[:l]) / lsum
                 ).astype(out_ref.dtype)
            out_ref[i, :, band] = o
            lse_ref[i, h] = jnp.broadcast_to(m + jnp.log(lsum),
                                             lse_ref.shape[2:])


def _bwd_kernel(qs_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, lse_ref,
                g_ref, dq_ref, dk_ref, dv_ref, drh_ref, drw_ref,
                *, l: int, heads: int, d: int, g: int, nb: int):
    lp = qs_ref.shape[1]
    e_h, e_w = _expanders(g, lp, jnp.float32)
    # transposed expanders built directly from iota (no in-kernel
    # transpose): e_ht[j, p] = [j // g == p], e_wt[j, w] = [j % g == w]
    jrow = jax.lax.broadcasted_iota(jnp.int32, (lp, g), 0)
    pcol = jax.lax.broadcasted_iota(jnp.int32, (lp, g), 1)
    e_ht = (jrow // g == pcol).astype(jnp.float32)
    e_wt = (jrow % g == pcol).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (lp, lp), 1)
    live = col < l
    for i in range(nb):
        for h in range(heads):
            band = slice(h * d, (h + 1) * d)
            qh = qs_ref[i][:, band]
            kh = k_ref[i][:, band]
            vh = v_ref[i][:, band]
            gh = g_ref[i][:, band]
            oh = o_ref[i][:, band]
            s = fa._qk(qh, kh)
            s = s + fa._matmul(rh_ref[i, h], e_h) + fa._matmul(
                rw_ref[i, h], e_w)
            p = jnp.where(live, jnp.exp(s - lse_ref[i, h][:, :1]), 0.0)
            dv_ref[i, :, band] = fa._matmul_tn(
                p.astype(gh.dtype), gh).astype(dv_ref.dtype)
            dp = fa._qk(gh, vh)
            di = jnp.sum(gh.astype(jnp.float32) * oh.astype(jnp.float32),
                         axis=1, keepdims=True)
            ds = (dp - di) * p
            ds_c = ds.astype(kh.dtype)
            dq_ref[i, :, band] = fa._matmul(ds_c, kh).astype(dq_ref.dtype)
            dk_ref[i, :, band] = fa._matmul_tn(ds_c, qh).astype(
                dk_ref.dtype)
            drh_ref[i, h] = fa._matmul(ds, e_ht).astype(drh_ref.dtype)
            drw_ref[i, h] = fa._matmul(ds, e_wt).astype(drw_ref.dtype)


# ------------------------------------------------------------ custom_vjp

def _pad_rows(x, lp):
    l = x.shape[-2]
    if l == lp:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, lp - l)
    return jnp.pad(x, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def bot_core(qs, k, v, rel_h, rel_w, num_heads, g):
    """Attention with decomposed rel-pos bias, one Pallas boundary.

    qs: ``[B, L, h*d]`` PRE-SCALED query (q / sqrt(d)); k, v same layout;
    rel_h, rel_w: ``[B, h, L, g]`` f32. Returns ``[B, L, h*d]``.
    """
    out, _ = _bot_fwd_impl(qs, k, v, rel_h, rel_w, num_heads, g)
    return out


def _images_per_step(b: int, l: int) -> int:
    """Images per grid step. MEASURED at botnet_t3 stage shapes
    (benchmarks/botnet_region_probe.py, fwd+bwd): nb=4 is 7% WORSE than
    nb=1 (2.314 vs 2.154 ms/layer) — the larger block quadruples the
    VMEM residency (the backward needed a raised scoped-VMEM cap) without
    improving MXU occupancy, so the pipeline depth Mosaic already gets
    from the unrolled head loop is the useful limit. Kept at 1."""
    return 1


def _bot_fwd_impl(qs, k, v, rel_h, rel_w, num_heads, g):
    b, l, hd = qs.shape
    d = hd // num_heads
    cdt = qs.dtype
    lp = max(fa._round_up(l, 16), 64)
    nb = _images_per_step(b, lp)
    qs_p, k_p, v_p = (_pad_rows(a, lp) for a in (qs, k, v))
    rh_p, rw_p = (_pad_rows(a, lp) for a in (rel_h, rel_w))

    x_spec = pl.BlockSpec((nb, lp, hd), lambda bi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((nb, num_heads, lp, g), lambda bi: (bi, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((nb, num_heads, lp, fa.STAT_LANES),
                            lambda bi: (bi, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, l=l, heads=num_heads, d=d, g=g,
                          nb=nb),
        grid=(b // nb,),
        in_specs=[x_spec, x_spec, x_spec, r_spec, r_spec],
        out_specs=[x_spec, lse_spec],
        out_shape=[jax.ShapeDtypeStruct((b, lp, hd), cdt),
                   jax.ShapeDtypeStruct((b, num_heads, lp, fa.STAT_LANES),
                                        jnp.float32)],
        interpret=fa._interpret(),
        **_cparams(),
    )(qs_p, k_p, v_p, rh_p, rw_p)
    return out[:, :l], (qs_p, k_p, v_p, rh_p, rw_p, out, lse)


def _bot_vjp_fwd(qs, k, v, rel_h, rel_w, num_heads, g):
    out, res = _bot_fwd_impl(qs, k, v, rel_h, rel_w, num_heads, g)
    return out, res


def _bot_vjp_bwd(num_heads, g, res, grad):
    qs_p, k_p, v_p, rh_p, rw_p, out_p, lse = res
    b, lp, hd = qs_p.shape
    d = hd // num_heads
    l = grad.shape[1]
    cdt = qs_p.dtype
    g_p = _pad_rows(grad.astype(cdt), lp)
    nb = _images_per_step(b, lp)

    x_spec = pl.BlockSpec((nb, lp, hd), lambda bi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((nb, num_heads, lp, g), lambda bi: (bi, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((nb, num_heads, lp, fa.STAT_LANES),
                            lambda bi: (bi, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    dq, dk, dv, drh, drw = pl.pallas_call(
        functools.partial(_bwd_kernel, l=l, heads=num_heads, d=d, g=g,
                          nb=nb),
        grid=(b // nb,),
        in_specs=[x_spec, x_spec, x_spec, r_spec, r_spec, x_spec,
                  lse_spec, x_spec],
        out_specs=[x_spec, x_spec, x_spec, r_spec, r_spec],
        out_shape=[jax.ShapeDtypeStruct((b, lp, hd), cdt),
                   jax.ShapeDtypeStruct((b, lp, hd), cdt),
                   jax.ShapeDtypeStruct((b, lp, hd), cdt),
                   jax.ShapeDtypeStruct((b, num_heads, lp, g),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((b, num_heads, lp, g),
                                        jnp.float32)],
        interpret=fa._interpret(),
        **_cparams(),
    )(qs_p, k_p, v_p, rh_p, rw_p, out_p, lse, g_p)
    cut = lambda a: a[:, :l]
    return (cut(dq), cut(dk), cut(dv), drh[:, :, :l], drw[:, :, :l])


bot_core.defvjp(_bot_vjp_fwd, _bot_vjp_bwd)


# ------------------------------------------------------------ wrappers

def botnet_mhsa(qs, k, v, emb_h, emb_w, num_heads: int, g: int):
    """Full BoTMHSA core: decomposed rel logits (XLA, autodiff) + fused
    attention kernel. qs is the PRE-SCALED query, band layout
    ``[B, L, h*d]``; emb_h/emb_w are the ``(2g-1, d)`` learned per-axis
    relative embeddings. Returns ``[B, L, h*d]``.
    """
    rel_h, rel_w = decomposed_rel_logits(qs, emb_h, emb_w, num_heads, g)
    return bot_core(qs, k, v, rel_h, rel_w, num_heads, g)


def botnet_attention_sublayer(x, wq, wk, wv, emb_h, emb_w,
                              num_heads: int, g: int):
    """Probe/serving convenience: qkv 1x1 projections (XLA) + fused core.

    x ``[B, L, D]``; wq/wk/wv ``[D, h, d]``. No out-projection — BoTMHSA
    has none (reference botnet.py:194-199).
    """
    b, l, dim = x.shape
    d = wq.shape[2]
    hd = num_heads * d
    flat = lambda w: w.reshape(dim, hd).astype(x.dtype)
    qs = (x @ flat(wq)) / jnp.sqrt(d).astype(x.dtype)
    k = x @ flat(wk)
    v = x @ flat(wv)
    return bot_core(qs, k, v,
                    *decomposed_rel_logits(qs, emb_h, emb_w, num_heads, g),
                    num_heads, g)


def bot_mhsa_reference(qs, k, v, emb_h, emb_w, num_heads: int, g: int):
    """jnp twin of :func:`botnet_mhsa` (same decomposed-rel math)."""
    rel_h, rel_w = decomposed_rel_logits(qs, emb_h, emb_w, num_heads, g)
    split = lambda a: rearrange(a, 'b l (h d) -> b h l d', h=num_heads)
    qh, kh, vh = split(qs), split(k), split(v)
    s = jnp.einsum('bhqd,bhkd->bhqk', qh, kh,
                   preferred_element_type=jnp.float32)
    bias = (rearrange(rel_h, 'b h (H W) P -> b h H W P', H=g)[..., :, None]
            + rearrange(rel_w, 'b h (H W) Q -> b h H W Q',
                        H=g)[..., None, :])
    s = s + rearrange(bias, 'b h H W P Q -> b h (H W) (P Q)')
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum('bhqk,bhkd->bhqd', p, vh)
    return rearrange(o, 'b h l d -> b l (h d)')
