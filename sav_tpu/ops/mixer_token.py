"""MLP-Mixer token-mixing sublayer as ONE Pallas kernel, images-in-lanes.

The reference expresses token mixing as an FFBlock on the transposed
``[B, D, L]`` layout (reference models/mlp_mixer.py:16-31). On TPU that
costs 1.87 of a 7.9 ms mixer_b layer for ~34 GF fwd+bwd (~18 TF/s): the
L=196 trailing dim pads to 256 lanes on every intermediate, two relayout
passes bracket the MLP, and the [*, 196]x[196, 98] GEMMs are MXU-starved
(`benchmarks/mixer_token_probe.py`; a transpose-free einsum formulation
measured 1.3% WORSE — XLA cannot fix this with layout choices).

This kernel keeps channels in lanes and never transposes. A block of NI
images arrives in the model's own ``[NI, L, D]`` layout (NO HBM relayout
— an earlier ``[L, NI*D]`` packed revision paid 4 transpose passes per
layer, ~0.5 ms, for the same math) and is lane-concatenated to
``[L, NI*D]`` inside VMEM, so

  * LayerNorm over d     = per-image lane reductions (VPU)
  * token-mix GEMM #1    = W1' [K, L] @ y [L, NI*D] — ONE wide MXU matmul
                           (contraction over the sublane token axis)
  * token-mix GEMM #2    = W2' [L, K] @ gelu(h) [K, NI*D]
  * biases               = [K, 1]/[L, 1] column broadcasts

The whole sublayer (LN -> Dense -> gelu -> Dense -> +residual) is one
custom_vjp; the backward recomputes from the input block (x is the only
residual) and accumulates every weight gradient in one f32 scratch tile
across grid blocks, flushed on the last block (the ops.tnt_inner
pattern). Zero-padded tail images are exact: their cotangent lanes are
zero, so every dW contribution vanishes.

Parameters are consumed in checkpoint layout (LayerNorm scale/bias [D],
FFBlock Dense_0 [L, K]/Dense_1 [K, L] kernels+biases), so the kernel and
per-op paths are checkpoint-interchangeable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sav_tpu.ops.tnt_inner import (_gelu_bwd_from_t, _gelu_fwd_t, _mm,
                                   _mm_nt, _mm_t)

LN_EPS = 1e-6
# images per grid block: test override; None = auto (targets ~6k lanes)
_NI = None
_VMEM_LIMIT = 64 * 1024 * 1024


def _ni_for(d: int) -> int:
    if _NI is not None:
        return _NI
    return max(1, 6144 // d)


def supported(l: int, k: int, d: int) -> bool:
    """Token counts bounded by the per-image [L, D] tile (sublane rows),
    lane-aligned channels."""
    return 8 <= l <= 256 and 8 <= k <= 256 and d % 128 == 0


# ------------------------------------------------------------- kernels

def _ln_bands(x_ref, ls, lb, ni, d):
    """Per-image LayerNorm over d of the [NI, L, D] block (f32).

    Returns the lane-concatenated y [L, NI*D] plus the xhat/inv
    recompute state per image."""
    ys, xhats, invs = [], [], []
    for i in range(ni):
        xs = x_ref[i].astype(jnp.float32)
        mu = jnp.mean(xs, axis=1, keepdims=True)
        var = jnp.maximum(jnp.mean(xs * xs, axis=1, keepdims=True)
                          - mu * mu, 0.0)
        inv = jax.lax.rsqrt(var + LN_EPS)
        xhat = (xs - mu) * inv
        ys.append(xhat * ls + lb)
        xhats.append(xhat)
        invs.append(inv)
    return jnp.concatenate(ys, axis=1), xhats, invs


def _fwd_kernel(x_ref, w_ref, out_ref, *, l, k, d, ni):
    g = _wslices(w_ref, l, k, d)
    y, _, _ = _ln_bands(x_ref, g['ls'], g['lb'], ni, d)
    yb = y.astype(x_ref.dtype)
    hp = _mm_t(g['w1'].astype(x_ref.dtype), yb) + g['b1']     # [K, NI*D]
    gact, _ = _gelu_fwd_t(hp)
    t = _mm_t(g['w2'].astype(x_ref.dtype),
              gact.astype(x_ref.dtype)) + g['b2']             # [L, NI*D]
    for i in range(ni):
        out_ref[i] = (x_ref[i].astype(jnp.float32)
                      + t[:, i * d:(i + 1) * d]).astype(out_ref.dtype)


def _bwd_kernel(x_ref, w_ref, do_ref, dx_ref, dw_ref, dw_acc,
                *, l, k, d, ni):
    """Recompute-everything backward; dW in one f32 scratch tile."""
    bi = pl.program_id(0)
    nblk = pl.num_programs(0)

    @pl.when(bi == 0)
    def _init():
        dw_acc[...] = jnp.zeros_like(dw_acc)

    g = _wslices(w_ref, l, k, d)
    cdt = x_ref.dtype

    # ---- recompute forward state
    y, xhats, invs = _ln_bands(x_ref, g['ls'], g['lb'], ni, d)
    yb = y.astype(cdt)
    hp = _mm_t(g['w1'].astype(cdt), yb) + g['b1']
    gact, t = _gelu_fwd_t(hp)
    gb = gact.astype(cdt)

    # ---- MLP backward (dt == do: the residual add is the last op)
    do = jnp.concatenate(
        [do_ref[i].astype(jnp.float32) for i in range(ni)], axis=1)
    dob = do.astype(cdt)
    dw2 = _mm_nt(gb, dob)                                     # [K, L]
    db2 = jnp.sum(do, axis=1, keepdims=True)                  # [L, 1]
    dgact = _mm(g['w2'].astype(cdt), dob)                     # [K, NI*D]
    dhp = dgact * _gelu_bwd_from_t(hp, t)
    dhpb = dhp.astype(cdt)
    dw1 = _mm_nt(yb, dhpb)                                    # [L, K]
    db1 = jnp.sum(dhp, axis=1, keepdims=True)                 # [K, 1]
    dy = _mm(g['w1'].astype(cdt), dhpb)                       # [L, NI*D]

    # ---- per-image LayerNorm backward over the lane bands
    dls = jnp.zeros((1, d), jnp.float32)
    dlb = jnp.zeros((1, d), jnp.float32)
    for i in range(ni):
        dyi = dy[:, i * d:(i + 1) * d]
        xhat, inv = xhats[i], invs[i]
        dxhat = dyi * g['ls']
        dls = dls + jnp.sum(dyi * xhat, axis=0, keepdims=True)
        dlb = dlb + jnp.sum(dyi, axis=0, keepdims=True)
        dx_ln = inv * (
            dxhat
            - jnp.mean(dxhat, axis=1, keepdims=True)
            - xhat * jnp.mean(dxhat * xhat, axis=1, keepdims=True))
        dx_ref[i] = (do[:, i * d:(i + 1) * d]
                     + dx_ln).astype(dx_ref.dtype)            # + residual

    rows, _, _ = _layout(l, k, d)
    dw_acc[rows['w1'][0]:rows['w1'][0] + l, :k] += dw1
    dw_acc[rows['w2'][0]:rows['w2'][0] + k, :l] += dw2
    dw_acc[rows['b1'][0]:rows['b1'][0] + 1, :k] += \
        jnp.transpose(db1, (1, 0))
    dw_acc[rows['b2'][0]:rows['b2'][0] + 1, :l] += \
        jnp.transpose(db2, (1, 0))
    dw_acc[rows['ls'][0]:rows['ls'][0] + 1, :d] += dls
    dw_acc[rows['lb'][0]:rows['lb'][0] + 1, :d] += dlb

    @pl.when(bi == nblk - 1)
    def _flush():
        dw_ref[...] = dw_acc[...]


# ----------------------------- packed parameter / gradient tile layout

def _layout(l, k, d):
    cols = max(l, k, d, 128)
    rows = {}
    r = 0
    for name, nr in (('w1', l), ('w2', k), ('b1', 1), ('b2', 1),
                     ('ls', 1), ('lb', 1)):
        rows[name] = (r, nr)
        r += nr
    return rows, r, cols


def _wslices(w_ref, l, k, d):
    rows, _, _ = _layout(l, k, d)
    w = w_ref[...]
    get = lambda name, nr, nc: w[rows[name][0]:rows[name][0] + nr, :nc]
    col = lambda name, n: jnp.transpose(get(name, 1, n), (1, 0))
    return {
        'w1': get('w1', l, k),
        'w2': get('w2', k, l),
        'b1': col('b1', k),                  # [K, 1]
        'b2': col('b2', l),                  # [L, 1]
        'ls': get('ls', 1, d),               # [1, D] lane row
        'lb': get('lb', 1, d),
    }


def _pack_weights(ls, lb, w1, b1, w2, b2, l, k, d):
    rows, total, cols = _layout(l, k, d)
    w = jnp.zeros((total, cols), jnp.float32)
    put = lambda w, name, val: w.at[
        rows[name][0]:rows[name][0] + val.shape[0],
        :val.shape[1]].set(val.astype(jnp.float32))
    w = put(w, 'w1', w1)
    w = put(w, 'w2', w2)
    for name, vec in (('b1', b1), ('b2', b2), ('ls', ls), ('lb', lb)):
        w = put(w, name, vec.reshape(1, -1))
    return w


def _unpack_grads(dw, l, k, d):
    rows, _, _ = _layout(l, k, d)
    get = lambda name, nr, nc: dw[rows[name][0]:rows[name][0] + nr, :nc]
    return dict(dw1=get('w1', l, k), dw2=get('w2', k, l),
                db1=dw[rows['b1'][0], :k], db2=dw[rows['b2'][0], :l],
                dls=dw[rows['ls'][0], :d], dlb=dw[rows['lb'][0], :d])


# ------------------------------------------------- batch padding

def _pad_batch(x, ni):
    """Zero-pads the batch to a multiple of NI (no relayout)."""
    b = x.shape[0]
    bp = -(-b // ni) * ni
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0), (0, 0)))
    return x


# --------------------------------------------------------- custom_vjp

@jax.custom_vjp
def token_mix_sublayer(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """``x + untranspose(FF(transpose(LN(x))))`` on [B, L, D]
    (reference models/mlp_mixer.py:16-24 semantics, without the
    transposes). w1 [L, K] / w2 [K, L] in checkpoint layout."""
    out, _ = _forward(x, ln_scale, ln_bias, w1, b1, w2, b2)
    return out


def _forward(x, ln_scale, ln_bias, w1, b1, w2, b2):
    b, l, d = x.shape
    k = w1.shape[1]
    cdt = x.dtype
    ni = _ni_for(d)
    xt = _pad_batch(x, ni)
    nblk = xt.shape[0] // ni
    w = _pack_weights(ln_scale, ln_bias, w1, b1, w2, b2, l, k, d)

    blk = pl.BlockSpec((ni, l, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(w.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    out_t = pl.pallas_call(
        functools.partial(_fwd_kernel, l=l, k=k, d=d, ni=ni),
        grid=(nblk,),
        in_specs=[blk, wspec],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(xt.shape, cdt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() != 'tpu',
    )(xt, w)
    return out_t[:b], (xt, w)


def _token_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2):
    out, saved = _forward(x, ln_scale, ln_bias, w1, b1, w2, b2)
    return out, saved


def _token_bwd(saved, g):
    xt, w = saved
    b, l, d = g.shape
    k = w.shape[0] - l - 4          # see _layout's row budget
    cdt = xt.dtype
    ni = _ni_for(d)
    nblk = xt.shape[0] // ni
    gt = _pad_batch(g.astype(cdt), ni)

    blk = pl.BlockSpec((ni, l, d), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(w.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    dx_t, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, l=l, k=k, d=d, ni=ni),
        grid=(nblk,),
        in_specs=[blk, wspec, blk],
        out_specs=[blk, wspec],
        out_shape=[jax.ShapeDtypeStruct(xt.shape, cdt),
                   jax.ShapeDtypeStruct(w.shape, jnp.float32)],
        scratch_shapes=[pltpu.VMEM(w.shape, jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() != 'tpu',
    )(xt, w, gt)

    dx = dx_t[:b]
    gr = _unpack_grads(dw, l, k, d)
    return (dx, gr['dls'], gr['dlb'], gr['dw1'], gr['db1'], gr['dw2'],
            gr['db2'])


token_mix_sublayer.defvjp(_token_fwd, _token_bwd)


# ---------------------------------------------------------- jnp twin

def token_mix_reference(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """Pure-jnp twin in the model's transposed layout, for equality
    tests (mirrors MixerBlock's per-op path)."""
    cdt = x.dtype
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mu * mu, 0.0)
    y = ((xf - mu) * jax.lax.rsqrt(var + LN_EPS) * ln_scale
         + ln_bias).astype(cdt)
    z = jnp.swapaxes(y, -1, -2)                               # [B, D, L]
    h = jax.nn.gelu(z @ w1.astype(cdt) + b1.astype(cdt))
    t = h @ w2.astype(cdt) + b2.astype(cdt)
    return x + jnp.swapaxes(t, -1, -2)
