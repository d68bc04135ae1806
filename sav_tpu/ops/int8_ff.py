"""Whole-FF int8 forward — one Pallas kernel for x @ W1 -> gelu -> @ W2.

Round-2's per-matmul int8 kernel (``int8_matmul_kernel.py``) lost end to
end for three measured reasons (docs/PERFORMANCE.md): int8 touched only
one GEMM at a time, the kernel boundary un-fused bias+gelu (extra full
passes over the [M, 4D] hidden), and the simple schedule re-read A. This
kernel removes all three at once for the FF sublayer: both GEMMs run int8
back-to-back in ONE kernel, the hidden activation lives only in VMEM
(never hits HBM), bias+gelu+requantize happen between the MXU issues, and
A (the x row block) is read exactly once.

Quantization scheme (symmetric int8, SwitchBack-flavored):
  * activations: per-row scales over the full contraction axis, computed
    in VMEM between DMA and MXU issue;
  * weights: pre-quantized per output column OUTSIDE the kernel (static
    per step, amortized by XLA);
  * accumulation: int32 MXU, rescaled to f32 once per GEMM.

The forward is exact w.r.t. the jnp twin (``int8_ff_reference``); training
semantics are quantization-aware (QAT): the backward is a straight-through
bf16 path that recomputes the hidden pre-activation from the stored x, so
no [M, 4D] residual is stored either. Reference FF semantics:
/root/reference/models/layers/ff_block.py (Dense -> gelu -> Dense).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sav_tpu.ops.int8_matmul_kernel import _quantize_tile
from sav_tpu.ops.quantized import quantize_symmetric

BLOCK_M = 256


def _interpret() -> bool:
    return jax.default_backend() != 'tpu'


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _ff_kernel(save_hpre, x_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
               b2_ref, out_ref, *maybe_hpre):
    hpre_ref = maybe_hpre[0] if save_hpre else None
    xq, xs = _quantize_tile(x_ref[...])
    h = jax.lax.dot_general(xq, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    hpre = h.astype(jnp.float32) * (xs * s1_ref[...]) + b1_ref[...]
    if hpre_ref is not None:
        # one bf16 store (~0.3 ms at ViT-B shapes) saves the backward's
        # x @ W1 recompute GEMM (~1.1 ms) — measured, see PERFORMANCE.md
        hpre_ref[...] = hpre.astype(hpre_ref.dtype)
    h = jax.nn.gelu(hpre)
    hq, hs = _quantize_tile(h)
    y = jax.lax.dot_general(hq, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (hs * s2_ref[...]) + b2_ref[...]
    out_ref[...] = y.astype(out_ref.dtype)


def int8_ff_raw(x, w1_q, s1, b1, w2_q, s2, b2, *, block_m: int = BLOCK_M,
                save_hpre: bool = False):
    """gelu(x @ deq(w1) + b1) @ deq(w2) + b2, hidden kept in VMEM.

    x [M, D] bf16/f32; w1_q [D, F] int8 with per-column scales s1 [1, F];
    w2_q [F, D] int8 with s2 [1, D]. Returns [M, D] in x.dtype, or a
    (out, hpre_bf16 [M, F]) pair when ``save_hpre`` (training mode — the
    backward consumes the pre-activation instead of recomputing it).
    """
    m, d = x.shape
    d2, f = w1_q.shape
    assert d == d2 and w2_q.shape == (f, d)
    assert s1.shape == (1, f) and s2.shape == (1, d)
    mp = _round_up(m, block_m)
    x_p = jnp.pad(x, ((0, mp - m), (0, 0)))

    out_specs = [pl.BlockSpec((block_m, d), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((mp, d), x.dtype)]
    if save_hpre:
        out_specs.append(pl.BlockSpec((block_m, f), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((mp, f), jnp.bfloat16))

    out = pl.pallas_call(
        functools.partial(_ff_kernel, save_hpre),
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=_interpret(),
    )(x_p, w1_q, s1, jnp.asarray(b1, jnp.float32).reshape(1, f),
      w2_q, s2, jnp.asarray(b2, jnp.float32).reshape(1, d))
    if save_hpre:
        return out[0][:m], out[1][:m]
    return out[0][:m]


def int8_ff_reference(x, w1_q, s1, b1, w2_q, s2, b2,
                      block_m: int = BLOCK_M):
    """jnp twin of the kernel math (same tiling, scales, and dtypes)."""
    m = x.shape[0]
    mp = _round_up(m, block_m)
    x_p = jnp.pad(x, ((0, mp - m), (0, 0)))
    outs = []
    for i in range(mp // block_m):
        tile = x_p[i * block_m:(i + 1) * block_m]
        xq, xs = _quantize_tile(tile)
        h = jax.lax.dot_general(xq, w1_q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        h = h.astype(jnp.float32) * (xs * s1) + b1.reshape(1, -1)
        h = jax.nn.gelu(h)
        hq, hs = _quantize_tile(h)
        y = jax.lax.dot_general(hq, w2_q, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (hs * s2) + b2.reshape(1, -1)
        outs.append(y.astype(x.dtype))
    return jnp.concatenate(outs)[:m]


def _quantized_weights(w1, w2):
    w1_q, s1 = quantize_symmetric(w1.astype(jnp.float32), axis=0)
    w2_q, s2 = quantize_symmetric(w2.astype(jnp.float32), axis=0)
    return w1_q, s1, w2_q, s2


@jax.custom_vjp
def _int8_ff_core(x, w1, b1, w2, b2):
    w1_q, s1, w2_q, s2 = _quantized_weights(w1, w2)
    return int8_ff_raw(x, w1_q, s1, b1, w2_q, s2, b2)


def _ff_fwd(x, w1, b1, w2, b2):
    w1_q, s1, w2_q, s2 = _quantized_weights(w1, w2)
    y, hpre = int8_ff_raw(x, w1_q, s1, b1, w2_q, s2, b2, save_hpre=True)
    return y, (x, w1, b1, w2, b2, hpre)


def _ff_bwd(residuals, g):
    # straight-through QAT backward: bf16 gradients as if unquantized;
    # the [M, F] pre-activation comes from the forward kernel (one bf16
    # store) instead of an x @ W1 recompute GEMM
    x, w1, b1, w2, b2, hpre = residuals
    hpre = hpre.astype(jnp.float32)
    h = jax.nn.gelu(hpre)
    g32 = g.astype(jnp.float32)
    dh = jax.lax.dot_general(g32, w2.astype(jnp.float32),
                             (((1,), (1,)), ((), ())))
    _, dgelu = jax.vjp(jax.nn.gelu, hpre)
    dhpre = dgelu(dh)[0]
    dx = jax.lax.dot_general(dhpre, w1.astype(jnp.float32),
                             (((1,), (1,)), ((), ())))
    dw1 = jax.lax.dot_general(x.astype(jnp.float32), dhpre,
                              (((0,), (0,)), ((), ())))
    db1 = jnp.sum(dhpre, axis=0)
    dw2 = jax.lax.dot_general(h, g32, (((0,), (0,)), ((), ())))
    db2 = jnp.sum(g32, axis=0)
    return (dx.astype(x.dtype), dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


_int8_ff_core.defvjp(_ff_fwd, _ff_bwd)


def int8_ff(x, w1, b1, w2, b2, switchback: bool = False):
    """Quantized FF sublayer body; x [..., D] -> [..., D]. ``switchback``
    swaps the straight-through QAT backward for the SwitchBack one (dx
    GEMMs int8, dW GEMMs high precision)."""
    flat = x.reshape(-1, x.shape[-1])
    core = _int8_ff_core_sb if switchback else _int8_ff_core
    out = core(flat, w1, b1, w2, b2)
    return out.reshape(*x.shape[:-1], w2.shape[-1])


# --------------------------------------- LN + FF + residual, one boundary
#
# Integration receipt (ViT-B/16 @224 bs=192, v5e): the bare int8_ff under
# its own custom_vjp LOSES end to end (169.5 vs 160.9 ms/step) even
# though the isolated FF wins by 8% — the boundary un-fuses LayerNorm_1
# from W1 (XLA absorbs LN into the following matmul for free, see
# docs/PERFORMANCE.md round-2 fusion probes). This span moves the
# boundary to the sublayer edge, the shape that measured boundary-free
# for attention (ops/fused_layer.py): LN runs INSIDE the kernel between
# DMA and quantization, and the residual add rides the output store.


def _ff_ln_kernel(save_hpre, eps, x_ref, scale_ref, bias_ref, w1_ref,
                  s1_ref, b1_ref, w2_ref, s2_ref, b2_ref, out_ref,
                  *maybe_hpre):
    hpre_ref = maybe_hpre[0] if save_hpre else None
    a = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(a, axis=1, keepdims=True)
    var = jnp.maximum(jnp.mean(a * a, axis=1, keepdims=True) - mu * mu,
                      0.0)
    y2 = ((a - mu) * jax.lax.rsqrt(var + eps)) * scale_ref[...] \
        + bias_ref[...]
    xq, xs = _quantize_tile(y2)
    h = jax.lax.dot_general(xq, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    hpre = h.astype(jnp.float32) * (xs * s1_ref[...]) + b1_ref[...]
    if hpre_ref is not None:
        hpre_ref[...] = hpre.astype(hpre_ref.dtype)
    hq, hs = _quantize_tile(jax.nn.gelu(hpre))
    f = jax.lax.dot_general(hq, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    f = f.astype(jnp.float32) * (hs * s2_ref[...]) + b2_ref[...]
    out_ref[...] = (a + f).astype(out_ref.dtype)


def int8_ff_ln_raw(x, scale, bias, w1_q, s1, b1, w2_q, s2, b2, *,
                   eps: float = 1e-6, block_m: int = BLOCK_M,
                   save_hpre: bool = False):
    """x + gelu(LN(x) @ deq(w1) + b1) @ deq(w2) + b2 in one kernel."""
    m, d = x.shape
    f = w1_q.shape[1]
    mp = _round_up(m, block_m)
    x_p = jnp.pad(x, ((0, mp - m), (0, 0)))

    row = lambda i: (i, 0)
    fixed = lambda i: (0, 0)
    out_specs = [pl.BlockSpec((block_m, d), row, memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((mp, d), x.dtype)]
    if save_hpre:
        out_specs.append(pl.BlockSpec((block_m, f), row,
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((mp, f), jnp.bfloat16))

    out = pl.pallas_call(
        functools.partial(_ff_ln_kernel, save_hpre, eps),
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
        interpret=_interpret(),
    )(x_p, jnp.asarray(scale, jnp.float32).reshape(1, d),
      jnp.asarray(bias, jnp.float32).reshape(1, d), w1_q, s1,
      jnp.asarray(b1, jnp.float32).reshape(1, f), w2_q, s2,
      jnp.asarray(b2, jnp.float32).reshape(1, d))
    if save_hpre:
        return out[0][:m], out[1][:m]
    return out[0][:m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def int8_ff_sublayer(x, scale, bias, w1, b1, w2, b2, eps=1e-6):
    """``x + FF_int8(LN(x))`` with ONE custom_vjp for the whole span.

    x is [B, L, D]; parameter layout matches LayerNorm + FFBlock
    (reference vit.py:26-31), so it is checkpoint-interchangeable with
    the unfused path. Backward is straight-through bf16 QAT consuming the
    kernel's stored pre-activation (no recompute GEMM).
    """
    w1_q, s1, w2_q, s2 = _quantized_weights(w1, w2)
    flat = x.reshape(-1, x.shape[-1])
    out = int8_ff_ln_raw(flat, scale, bias, w1_q, s1, b1, w2_q, s2, b2,
                         eps=eps)
    return out.reshape(x.shape)


def _sublayer_fwd(x, scale, bias, w1, b1, w2, b2, eps):
    w1_q, s1, w2_q, s2 = _quantized_weights(w1, w2)
    flat = x.reshape(-1, x.shape[-1])
    out, hpre = int8_ff_ln_raw(flat, scale, bias, w1_q, s1, b1, w2_q, s2,
                               b2, eps=eps, save_hpre=True)
    return out.reshape(x.shape), (x, scale, bias, w1, b1, w2, b2, hpre)


def _layernorm_bwd_flat(dy, xhat, inv, scale):
    """(dx, dscale, dbias) of LayerNorm on flat [M, D] arrays."""
    dyf = dy.astype(jnp.float32)
    dscale = jnp.sum(dyf * xhat, axis=0)
    dbias = jnp.sum(dyf, axis=0)
    dxhat = dyf * scale.astype(jnp.float32)
    dx = inv * (dxhat
                - jnp.mean(dxhat, axis=-1, keepdims=True)
                - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    return dx, dscale, dbias


def _sublayer_bwd(eps, saved, g):
    from sav_tpu.ops.fused_layer import _layernorm

    x, scale, bias, w1, b1, w2, b2, hpre = saved
    cdt = x.dtype
    shape3 = x.shape
    xf = x.reshape(-1, shape3[-1])
    gf = g.reshape(-1, shape3[-1]).astype(cdt)
    # LN stats recomputed from x (bandwidth-cheap); hidden pre-activation
    # comes from the forward kernel's bf16 store. Flat [M, ...]
    # dot_generals mirror the bare-kernel QAT backward that measured
    # 5.1 ms at ViT-B shapes; [M, 4D] elementwise stays in the compute
    # dtype (an f32 variant kept ~1.9 GB live and OOM'd the chip).
    y2, xhat, inv = _layernorm(xf, scale, bias, eps)
    hpre = hpre.astype(cdt)
    gact, gelu_vjp = jax.vjp(jax.nn.gelu, hpre)
    w1c, w2c = w1.astype(cdt), w2.astype(cdt)
    dgact = jax.lax.dot_general(gf, w2c, (((1,), (1,)), ((), ())))
    dw2 = jax.lax.dot_general(gact, gf, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db2 = jnp.sum(gf, axis=0, dtype=jnp.float32)
    dh = gelu_vjp(dgact)[0]
    dw1 = jax.lax.dot_general(y2, dh, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dh, axis=0, dtype=jnp.float32)
    dy2 = jax.lax.dot_general(dh, w1c, (((1,), (1,)), ((), ())))
    dx_ln, dscale, dbias = _layernorm_bwd_flat(dy2, xhat, inv, scale)
    dx = (dx_ln + gf.astype(jnp.float32)).astype(cdt)
    return (dx.reshape(shape3), dscale.astype(scale.dtype),
            dbias.astype(bias.dtype), dw1.astype(w1.dtype),
            db1.astype(b1.dtype), dw2.astype(w2.dtype),
            db2.astype(b2.dtype))


int8_ff_sublayer.defvjp(_sublayer_fwd, _sublayer_bwd)


# ------------------------- SwitchBack backward (int8 dx GEMMs, one kernel)
#
# The QAT backward above is pure bf16 XLA — int8 touches only ~20% of the
# FF's train-step GEMM FLOPs, which is why `--quantized ff` measured a
# LOSS end to end despite the forward kernel's isolated win. SwitchBack
# (Wortsman et al., arXiv:2304.13013) quantizes the activation-gradient
# GEMMs too while keeping the weight-gradient GEMMs in high precision
# (per-row grad quantization is exact enough for dx, but dW contracts the
# batch axis where int8 rounding would bias the update). This kernel runs
# BOTH dx GEMMs int8 back-to-back with the gelu-vjp fused between them:
#   dgact = q(g) @ q(W2^T)   [int32 MXU]
#   dh    = gelu'(hpre) * dgact            (stored bf16, feeds dW1/db1)
#   dy2   = q(dh) @ q(W1^T)  [int32 MXU]
# so the [M, 4D] dgact transient never reaches HBM and 4 of the 6
# sublayer GEMMs are int8. Weight-grad GEMMs and LN backward stay XLA.


def _dx_quantized(w):
    """Quantize ``w [in, out]`` for its dx GEMM ``g @ w^T``: contraction
    runs over the OUT axis, so scales are per IN row; returned transposed
    as the kernel's [out, in] right-hand operand with scales [1, in]."""
    wq, s = quantize_symmetric(w.astype(jnp.float32), axis=1)
    return wq.T, s.reshape(1, -1)


def _ff_dx_kernel(g_ref, hpre_ref, w2t_ref, s2t_ref, w1t_ref, s1t_ref,
                  dy2_ref, dh_ref):
    gq, gs = _quantize_tile(g_ref[...])
    da = jax.lax.dot_general(gq, w2t_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    dgact = da.astype(jnp.float32) * (gs * s2t_ref[...])
    hpre = hpre_ref[...].astype(jnp.float32)
    _, gelu_vjp = jax.vjp(jax.nn.gelu, hpre)
    dh = gelu_vjp(dgact)[0]
    dh_ref[...] = dh.astype(dh_ref.dtype)
    dhq, dhs = _quantize_tile(dh)
    dy = jax.lax.dot_general(dhq, w1t_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    dy2_ref[...] = (dy.astype(jnp.float32)
                    * (dhs * s1t_ref[...])).astype(dy2_ref.dtype)


def int8_ff_dx_raw(g, hpre, w1t_q, s1t, w2t_q, s2t, *,
                   block_m: int = BLOCK_M):
    """dx path of the FF backward, both GEMMs int8 in one kernel.

    g [M, D] output cotangent; hpre [M, F] stored pre-activation;
    w2t_q [D, F] / w1t_q [F, D] from ``_dx_quantized``. Returns
    (dy2 [M, D] in g.dtype, dh [M, F] bf16).
    """
    m, d = g.shape
    f = hpre.shape[1]
    assert w2t_q.shape == (d, f) and w1t_q.shape == (f, d)
    assert s2t.shape == (1, f) and s1t.shape == (1, d)
    # padding hpre costs a [M, F] HBM copy per layer (232 MB at ViT-B
    # @224 bs192 — enough to OOM the chip inside the train scan); prefer
    # a block size that divides M exactly and pad only as a last resort
    if m % block_m:
        block_m = next((bm for bm in (256, 224, 192, 160, 128, 96, 64,
                                      32, 16, 8) if m % bm == 0), block_m)
    mp = _round_up(m, block_m)
    g_p = jnp.pad(g, ((0, mp - m), (0, 0))) if mp != m else g
    h_p = jnp.pad(hpre, ((0, mp - m), (0, 0))) if mp != m else hpre

    row = lambda i: (i, 0)
    fixed = lambda i: (0, 0)
    dy2, dh = pl.pallas_call(
        _ff_dx_kernel,
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, f), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), fixed, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_m, d), row, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, f), row, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, d), g.dtype),
            jax.ShapeDtypeStruct((mp, f), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=_interpret(),
    )(g_p, h_p, w2t_q, s2t, w1t_q, s1t)
    return dy2[:m], dh[:m]


def int8_ff_dx_reference(g, hpre, w1t_q, s1t, w2t_q, s2t):
    """jnp twin of ``_ff_dx_kernel`` (per-row quantization is row-local,
    so no block split is needed to match the kernel bit-for-bit)."""
    gq, gs = _quantize_tile(g)
    da = jax.lax.dot_general(gq, w2t_q, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    dgact = da.astype(jnp.float32) * (gs * s2t)
    hpre = hpre.astype(jnp.float32)
    _, gelu_vjp = jax.vjp(jax.nn.gelu, hpre)
    dh = gelu_vjp(dgact)[0]
    dhq, dhs = _quantize_tile(dh)
    dy = jax.lax.dot_general(dhq, w1t_q, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    dy2 = (dy.astype(jnp.float32) * (dhs * s1t)).astype(g.dtype)
    return dy2, dh.astype(jnp.bfloat16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def int8_ff_sublayer_sb(x, scale, bias, w1, b1, w2, b2, eps=1e-6):
    """``int8_ff_sublayer`` with the SwitchBack backward: same int8
    forward kernel, dx GEMMs int8 (``int8_ff_dx_raw``), dW GEMMs bf16."""
    w1_q, s1, w2_q, s2 = _quantized_weights(w1, w2)
    flat = x.reshape(-1, x.shape[-1])
    out = int8_ff_ln_raw(flat, scale, bias, w1_q, s1, b1, w2_q, s2, b2,
                         eps=eps)
    return out.reshape(x.shape)


def _sublayer_sb_fwd(x, scale, bias, w1, b1, w2, b2, eps):
    return _sublayer_fwd(x, scale, bias, w1, b1, w2, b2, eps)


def _sublayer_sb_bwd(eps, saved, g):
    from sav_tpu.ops.fused_layer import _layernorm

    x, scale, bias, w1, b1, w2, b2, hpre = saved
    cdt = x.dtype
    shape3 = x.shape
    xf = x.reshape(-1, shape3[-1])
    gf = g.reshape(-1, shape3[-1]).astype(cdt)
    y2, xhat, inv = _layernorm(xf, scale, bias, eps)

    w1t_q, s1t = _dx_quantized(w1)
    w2t_q, s2t = _dx_quantized(w2)
    dy2, dh = int8_ff_dx_raw(gf, hpre, w1t_q, s1t, w2t_q, s2t)

    dh_c = dh.astype(cdt)
    dw1 = jax.lax.dot_general(y2, dh_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dh_c, axis=0, dtype=jnp.float32)
    gact = jax.nn.gelu(hpre.astype(cdt))   # fuses into the dW2 GEMM read
    dw2 = jax.lax.dot_general(gact, gf, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db2 = jnp.sum(gf, axis=0, dtype=jnp.float32)

    dx_ln, dscale, dbias = _layernorm_bwd_flat(dy2, xhat, inv, scale)
    dx = (dx_ln + gf.astype(jnp.float32)).astype(cdt)
    return (dx.reshape(shape3), dscale.astype(scale.dtype),
            dbias.astype(bias.dtype), dw1.astype(w1.dtype),
            db1.astype(b1.dtype), dw2.astype(w2.dtype),
            db2.astype(b2.dtype))


int8_ff_sublayer_sb.defvjp(_sublayer_sb_fwd, _sublayer_sb_bwd)


@jax.custom_vjp
def _int8_ff_core_sb(x, w1, b1, w2, b2):
    w1_q, s1, w2_q, s2 = _quantized_weights(w1, w2)
    return int8_ff_raw(x, w1_q, s1, b1, w2_q, s2, b2)


def _ff_sb_bwd(residuals, g):
    # SwitchBack backward of the bare (no-LN) core: dx GEMMs int8 via the
    # fused dx kernel, dW GEMMs high-precision XLA
    x, w1, b1, w2, b2, hpre = residuals
    cdt = x.dtype
    gf = g.astype(cdt)
    w1t_q, s1t = _dx_quantized(w1)
    w2t_q, s2t = _dx_quantized(w2)
    dx, dh = int8_ff_dx_raw(gf, hpre, w1t_q, s1t, w2t_q, s2t)
    dh_c = dh.astype(cdt)
    dw1 = jax.lax.dot_general(x.astype(cdt), dh_c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dh_c, axis=0, dtype=jnp.float32)
    gact = jax.nn.gelu(hpre.astype(cdt))
    dw2 = jax.lax.dot_general(gact, gf, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db2 = jnp.sum(gf, axis=0, dtype=jnp.float32)
    return (dx.astype(x.dtype), dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype))


_int8_ff_core_sb.defvjp(_ff_fwd, _ff_sb_bwd)
