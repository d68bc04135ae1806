"""TNT inner-transformer layer as ONE Pallas kernel, patches-in-lanes.

TNT's inner transformer runs [B*196, 16, 24] pixel-token tensors
(reference models/tnt.py:36-76). On TPU their 16/24-wide trailing dims
pad to the 128-lane tile — an 8x memory/bandwidth expansion on every
intermediate (the train step's HLO dump shows 2.3 GB buffers holding
294 MB), which is why the inner stack costs ~9 ms/layer for <1 GFLOP of
arithmetic. XLA cannot fix this: the layout is forced by the einsum
semantics (a transposed jnp formulation measured 14% WORSE —
benchmarks/tnt_inner_layout_probe.py).

This kernel stores a block of NB patches TRANSPOSED as [D, L*NB]
(channels in sublanes, lane = token*NB + patch), so every tensor is
naturally lane-aligned:

  * LayerNorm over d   = sublane reductions
  * all projections    = ONE wide MXU matmul  [D', D] @ [D, L*NB]
  * per-patch attention = unrolled VPU multiply + sublane-sums over the
    tiny c=D/H axis; probabilities live as [L, NB] rows, never padded
  * FF                 = [4D, D]/[D, 4D] matmuls + gelu on [4D, L*NB]

The whole layer (LN -> SA -> residual -> LN -> FF -> residual) is one
custom_vjp; the backward RECOMPUTES everything from the input block
(the only residual is x itself) and accumulates all weight gradients in
a single f32 scratch vector across grid blocks. Layout conversion
to/from the model's [B*P, L, D] happens inside the boundary (~0.12
ms/layer, measured). Forward: 5.78 -> 1.13 ms/layer at TNT-S @224 bs64
shapes (benchmarks/tnt_inner_kernel_proto.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6
# patches per grid block: test override (tests pin 128); None = auto
_NB = None
_VMEM_LIMIT = 64 * 1024 * 1024


def _nb_for(d: int) -> int:
    """Lane width (patches) per grid block, scaled so the backward's
    f32 working set (~recompute state + per-head lists, all [d, L*NB])
    stays inside the 64 MB scoped-VMEM budget. d=24 (TNT-S) -> 896
    (measured); d=40 (TNT-B) at 896 overflowed by 8 MB (72.19 vs 64),
    so the patch budget scales inversely with d."""
    if _NB is not None:
        return _NB
    return max(128, (896 * 24 // d) // 128 * 128)

# dW scratch layout: one f32 [GROWS, max(4D, 128)] tile holding every
# weight/bias gradient, flushed on the last grid block (see _gslices)


def supported(l: int, d: int, num_heads: int) -> bool:
    """Sublane-aligned channels, tokens bounded (unrolled loops)."""
    return d % 8 == 0 and d % num_heads == 0 and 4 <= l <= 32 and d <= 64


def _mm(w, x):
    """w [M, K] @ x [K, N], f32 accumulation."""
    return jax.lax.dot_general(w, x, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_t(w, x):
    """w [K, M]^T @ x [K, N] -> [M, N], f32 accumulation."""
    return jax.lax.dot_general(w, x, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mm_nt(a, b):
    """a [M, N] @ b [K, N]^T -> [M, K] (lane contraction)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _ln_rows(x, scale, bias, eps=LN_EPS):
    """LN over the sublane (d) axis of [D, N]; returns (y, xhat, inv)."""
    mu = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=0, keepdims=True) - mu * mu,
                      0.0)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x - mu) * inv
    return xhat * scale + bias, xhat, inv


def _ln_rows_bwd(dy, xhat, inv, scale, d):
    dxhat = dy * scale
    dscale = jnp.sum(dy * xhat, axis=1, keepdims=True)
    dbias = jnp.sum(dy, axis=1, keepdims=True)
    dx = inv * (dxhat
                - jnp.mean(dxhat, axis=0, keepdims=True)
                - xhat * jnp.mean(dxhat * xhat, axis=0, keepdims=True))
    return dx, dscale, dbias


_GELU_C = 0.7978845608028654
_GELU_A = 0.044715


def _gelu_fwd_t(hp):
    t = jnp.tanh(_GELU_C * (hp + _GELU_A * hp * hp * hp))
    return 0.5 * hp * (1.0 + t), t


def _gelu_bwd_from_t(hp, t):
    return (0.5 * (1.0 + t)
            + 0.5 * hp * (1.0 - t * t) * _GELU_C
            * (1.0 + 3.0 * _GELU_A * hp * hp))


def _attention_t(q, k, v, l, nb, heads, hd):
    """Per-patch attention in the transposed layout.

    q/k/v [D, L*NB] f32 (q pre-scaled). Returns o [D, L*NB] f32 and the
    per-(h, ql) probability rows for the backward's recompute-free use
    (they are cheap: [L, NB] f32 each, discarded after the block)."""
    lane = lambda a, i: a[:, i * nb:(i + 1) * nb]
    head = lambda a, h: a[h * hd:(h + 1) * hd]
    o_heads = []
    probs = []
    for h in range(heads):
        qh, kh, vh = head(q, h), head(k, h), head(v, h)
        rows = []
        for ql in range(l):
            qv = lane(qh, ql)
            s = jnp.concatenate(
                [jnp.sum(qv * lane(kh, p), axis=0, keepdims=True)
                 for p in range(l)], axis=0)          # [L, NB]
            m = jnp.max(s, axis=0, keepdims=True)
            e = jnp.exp(s - m)
            a = e / jnp.sum(e, axis=0, keepdims=True)
            probs.append(a)
            acc = a[0:1] * lane(vh, 0)
            for p in range(1, l):
                acc = acc + a[p:p + 1] * lane(vh, p)
            rows.append(acc)
        o_heads.append(jnp.concatenate(rows, axis=1))
    return jnp.concatenate(o_heads, axis=0), probs


def _fwd_kernel(x_ref, w_ref, out_ref, *, l, nb, d, ff, heads):
    hd = d // heads
    g = _wslices(w_ref, d, ff)
    x = x_ref[0].astype(jnp.float32)
    y, _, _ = _ln_rows(x, g['ln1s'], g['ln1b'])
    yb = y.astype(x_ref.dtype)
    sc = 1.0 / (hd ** 0.5)
    q = _mm(g['wqt'].astype(x_ref.dtype), yb) * sc
    k = _mm(g['wkt'].astype(x_ref.dtype), yb)
    v = _mm(g['wvt'].astype(x_ref.dtype), yb)
    o, _ = _attention_t(q, k, v, l, nb, heads, hd)
    x2 = x + _mm(g['wot'].astype(x_ref.dtype), o.astype(x_ref.dtype))
    y2, _, _ = _ln_rows(x2, g['ln2s'], g['ln2b'])
    hp = _mm(g['w1t'].astype(x_ref.dtype), y2.astype(x_ref.dtype)) \
        + g['b1']
    gact, _ = _gelu_fwd_t(hp)
    out = x2 + _mm(g['w2t'].astype(x_ref.dtype),
                   gact.astype(x_ref.dtype)) + g['b2']
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(x_ref, w_ref, do_ref, dx_ref, dw_ref, dw_acc,
                *, l, nb, d, ff, heads):
    """Recompute-everything backward; dW in one f32 scratch tile."""
    hd = d // heads
    bi = pl.program_id(0)
    nblk = pl.num_programs(0)

    @pl.when(bi == 0)
    def _init():
        dw_acc[...] = jnp.zeros_like(dw_acc)

    g = _wslices(w_ref, d, ff)
    lane = lambda a, i: a[:, i * nb:(i + 1) * nb]
    head = lambda a, h: a[h * hd:(h + 1) * hd]
    cdt = x_ref.dtype

    # ---- recompute forward state
    x = x_ref[0].astype(jnp.float32)
    y, xhat1, inv1 = _ln_rows(x, g['ln1s'], g['ln1b'])
    yb = y.astype(cdt)
    sc = 1.0 / (hd ** 0.5)
    q = _mm(g['wqt'].astype(cdt), yb) * sc
    k = _mm(g['wkt'].astype(cdt), yb)
    v = _mm(g['wvt'].astype(cdt), yb)
    o, _ = _attention_t(q, k, v, l, nb, heads, hd)
    ob = o.astype(cdt)
    x2 = x + _mm(g['wot'].astype(cdt), ob)
    y2, xhat2, inv2 = _ln_rows(x2, g['ln2s'], g['ln2b'])
    y2b = y2.astype(cdt)
    hp = _mm(g['w1t'].astype(cdt), y2b) + g['b1']
    gact, t = _gelu_fwd_t(hp)
    gb = gact.astype(cdt)

    # ---- FF backward
    do = do_ref[0].astype(jnp.float32)
    dob = do.astype(cdt)
    dg = _mm_t(g['w2t'].astype(cdt), dob)                 # [FF, N]
    dw2t = _mm_nt(dob, gb)                                # [D, FF]
    db2 = jnp.sum(do, axis=1, keepdims=True)
    dhp = dg * _gelu_bwd_from_t(hp, t)
    dhpb = dhp.astype(cdt)
    dw1t = _mm_nt(dhpb, y2b)                              # [FF, D]
    db1 = jnp.sum(dhp, axis=1, keepdims=True)
    dy2 = _mm_t(g['w1t'].astype(cdt), dhpb)               # [D, N]
    dx2_ln, dln2s, dln2b = _ln_rows_bwd(dy2, xhat2, inv2, g['ln2s'], d)
    dx2 = dx2_ln + do                                     # FF residual

    # ---- attention backward
    dao = dx2.astype(cdt)
    do_attn = _mm_t(g['wot'].astype(cdt), dao)            # [D, N] = dO
    dwot = _mm_nt(dao, ob)                                # [D, D]

    dq = []
    dk_lane = [[None] * l for _ in range(heads)]
    dv_lane = [[None] * l for _ in range(heads)]
    for h in range(heads):
        qh, kh, vh = head(q, h), head(k, h), head(v, h)
        doh = head(do_attn, h)
        dq_rows = []
        for ql in range(l):
            qv = lane(qh, ql)
            dov = lane(doh, ql)
            s = jnp.concatenate(
                [jnp.sum(qv * lane(kh, p), axis=0, keepdims=True)
                 for p in range(l)], axis=0)
            m = jnp.max(s, axis=0, keepdims=True)
            e = jnp.exp(s - m)
            a = e / jnp.sum(e, axis=0, keepdims=True)     # [L, NB]
            da = jnp.concatenate(
                [jnp.sum(dov * lane(vh, p), axis=0, keepdims=True)
                 for p in range(l)], axis=0)
            ds = a * (da - jnp.sum(da * a, axis=0, keepdims=True))
            dq_acc = ds[0:1] * lane(kh, 0)
            for p in range(1, l):
                dq_acc = dq_acc + ds[p:p + 1] * lane(kh, p)
            dq_rows.append(dq_acc)
            for p in range(l):
                dk_c = ds[p:p + 1] * qv
                dv_c = a[p:p + 1] * dov
                if dk_lane[h][p] is None:
                    dk_lane[h][p] = dk_c
                    dv_lane[h][p] = dv_c
                else:
                    dk_lane[h][p] = dk_lane[h][p] + dk_c
                    dv_lane[h][p] = dv_lane[h][p] + dv_c
        dq.append(jnp.concatenate(dq_rows, axis=1))
    dq_f = jnp.concatenate(dq, axis=0) * sc               # [D, N]
    dk_f = jnp.concatenate(
        [jnp.concatenate(dk_lane[h], axis=1) for h in range(heads)],
        axis=0)
    dv_f = jnp.concatenate(
        [jnp.concatenate(dv_lane[h], axis=1) for h in range(heads)],
        axis=0)

    dqb, dkb, dvb = (a.astype(cdt) for a in (dq_f, dk_f, dv_f))
    dwqt = _mm_nt(dqb, yb)
    dwkt = _mm_nt(dkb, yb)
    dwvt = _mm_nt(dvb, yb)
    dy = (_mm_t(g['wqt'].astype(cdt), dqb)
          + _mm_t(g['wkt'].astype(cdt), dkb)
          + _mm_t(g['wvt'].astype(cdt), dvb))
    dx_ln, dln1s, dln1b = _ln_rows_bwd(dy, xhat1, inv1, g['ln1s'], d)
    dx = dx_ln + dx2                                      # SA residual

    dx_ref[0] = dx.astype(dx_ref.dtype)

    # ---- accumulate weight grads in the packed scratch
    _accumulate(dw_acc, d, ff, dwqt=dwqt, dwkt=dwkt, dwvt=dwvt,
                dwot=dwot, dw1t=dw1t, dw2t=dw2t, dln1s=dln1s,
                dln1b=dln1b, dln2s=dln2s, dln2b=dln2b, db1=db1, db2=db2)

    @pl.when(bi == nblk - 1)
    def _flush():
        dw_ref[...] = dw_acc[...]


# ----------------------------- packed parameter / gradient tile layout

def _layout(d, ff):
    """Row-range map of the packed [rows, cols] parameter tile."""
    cols = max(ff, 128)
    rows = {}
    r = 0
    for name, (nr, nc) in (('wqt', (d, d)), ('wkt', (d, d)),
                           ('wvt', (d, d)), ('wot', (d, d)),
                           ('w1t', (ff, d)), ('w2t', (d, ff)),
                           ('ln1s', (1, 1)), ('ln1b', (1, 1)),
                           ('ln2s', (1, 1)), ('ln2b', (1, 1)),
                           ('b1', (1, ff)), ('b2', (1, d))):
        rows[name] = (r, nr, nc)
        r += nr
    return rows, r, cols


def _wslices(w_ref, d, ff):
    """Views of the packed tile as the individual parameter arrays.

    LN vectors and biases come back with the orientation the kernel
    uses: ln*/b2 as [D, 1] columns, b1 as [FF, 1]."""
    rows, _, _ = _layout(d, ff)
    w = w_ref[...]
    out = {}
    for name, (r, nr, nc) in rows.items():
        block = w[r:r + nr, :nc]
        out[name] = block
    # vectors: stored as rows, used as columns
    out['ln1s'] = _col(w, rows['ln1s'], d)
    out['ln1b'] = _col(w, rows['ln1b'], d)
    out['ln2s'] = _col(w, rows['ln2s'], d)
    out['ln2b'] = _col(w, rows['ln2b'], d)
    out['b1'] = _col(w, rows['b1'], ff)
    out['b2'] = _col(w, rows['b2'], d)
    return out


def _col(w, spec, n):
    r, _, _ = spec
    return jnp.transpose(w[r:r + 1, :n], (1, 0))          # [n, 1]


def _accumulate(dw_acc, d, ff, **grads):
    rows, _, _ = _layout(d, ff)
    for name in ('wqt', 'wkt', 'wvt', 'wot', 'w1t', 'w2t'):
        r, nr, nc = rows[name]
        dw_acc[r:r + nr, :nc] += grads['d' + name]
    for name, n in (('ln1s', d), ('ln1b', d), ('ln2s', d),
                    ('ln2b', d), ('b1', ff), ('b2', d)):
        r, _, _ = rows[name]
        dw_acc[r:r + 1, :n] += jnp.transpose(grads['d' + name], (1, 0))


def _pack_weights(wq, wk, wv, wo, w1, b1, w2, b2, ln1s, ln1b, ln2s,
                  ln2b, d, ff):
    rows, total, cols = _layout(d, ff)
    w = jnp.zeros((total, cols), jnp.float32)
    put = lambda w, name, val: w.at[
        rows[name][0]:rows[name][0] + val.shape[0],
        :val.shape[1]].set(val.astype(jnp.float32))
    w = put(w, 'wqt', wq.reshape(d, d).T)
    w = put(w, 'wkt', wk.reshape(d, d).T)
    w = put(w, 'wvt', wv.reshape(d, d).T)
    w = put(w, 'wot', wo.reshape(d, d).T)
    w = put(w, 'w1t', w1.T)
    w = put(w, 'w2t', w2.T)
    for name, vec in (('ln1s', ln1s), ('ln1b', ln1b), ('ln2s', ln2s),
                      ('ln2b', ln2b), ('b1', b1), ('b2', b2)):
        w = put(w, name, vec.reshape(1, -1))
    return w


def _unpack_grads(dw, d, ff):
    rows, _, _ = _layout(d, ff)
    get = lambda name: dw[rows[name][0]:rows[name][0] + rows[name][1],
                          :rows[name][2]]
    vec = lambda name, n: dw[rows[name][0], :n]
    return dict(
        dwq=get('wqt').T, dwk=get('wkt').T, dwv=get('wvt').T,
        dwo=get('wot').T, dw1=get('w1t').T, dw2=get('w2t').T,
        dln1s=vec('ln1s', d), dln1b=vec('ln1b', d),
        dln2s=vec('ln2s', d), dln2b=vec('ln2b', d),
        db1=vec('b1', ff), db2=vec('b2', d))


# ------------------------------------------------- layout conversions

def _to_blocked(x, nb):
    """[BP, L, D] -> [NBLK, D, L*NBpad] with zero patch padding."""
    bp, l, d = x.shape
    bpp = -(-bp // nb) * nb
    if bpp != bp:
        x = jnp.pad(x, ((0, bpp - bp), (0, 0), (0, 0)))
    nblk = bpp // nb
    return jnp.transpose(x.reshape(nblk, nb, l, d), (0, 3, 2, 1)) \
              .reshape(nblk, d, l * nb)


def _from_blocked(xt, bp, nb):
    nblk, d, lnb = xt.shape
    l = lnb // nb
    out = jnp.transpose(xt.reshape(nblk, d, l, nb), (0, 3, 2, 1)) \
             .reshape(nblk * nb, l, d)
    return out[:bp]


# --------------------------------------------------------- custom_vjp

@functools.partial(jax.custom_vjp, nondiff_argnums=(13,))
def inner_layer(x, ln1s, ln1b, wq, wk, wv, wo, ln2s, ln2b, w1, b1, w2,
                b2, num_heads):
    """One TNT inner layer on [B*P, L, D] (reference tnt.py:82-94
    semantics: LN -> SA -> +res -> LN -> FF -> +res).

    wq/wk/wv [D, H, hd] and wo [H, hd, D] in checkpoint layout."""
    out, _ = _forward(x, ln1s, ln1b, wq, wk, wv, wo, ln2s, ln2b, w1, b1,
                      w2, b2, num_heads)
    return out


def _forward(x, ln1s, ln1b, wq, wk, wv, wo, ln2s, ln2b, w1, b1, w2, b2,
             num_heads):
    bp, l, d = x.shape
    ff = w1.shape[1]
    cdt = x.dtype
    nb = _nb_for(d)
    xt = _to_blocked(x, nb)
    nblk = xt.shape[0]
    w = _pack_weights(wq, wk, wv, wo, w1, b1, w2, b2, ln1s, ln1b, ln2s,
                      ln2b, d, ff)

    blk = pl.BlockSpec((1, d, l * nb), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(w.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    out_t = pl.pallas_call(
        functools.partial(_fwd_kernel, l=l, nb=nb, d=d, ff=ff,
                          heads=num_heads),
        grid=(nblk,),
        in_specs=[blk, wspec],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(xt.shape, cdt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=jax.default_backend() != 'tpu',
    )(xt, w)
    return _from_blocked(out_t, bp, nb), (xt, w)


def _inner_fwd(x, ln1s, ln1b, wq, wk, wv, wo, ln2s, ln2b, w1, b1, w2,
               b2, num_heads):
    out, (xt, w) = _forward(x, ln1s, ln1b, wq, wk, wv, wo, ln2s, ln2b,
                            w1, b1, w2, b2, num_heads)
    return out, (xt, w)


def _inner_bwd(num_heads, saved, g):
    xt, w = saved
    bp, l, d = g.shape
    ff = w.shape[0] - 5 * d - 6     # see _layout's row budget
    cdt = xt.dtype
    wq_shape = (d, num_heads, d // num_heads)
    nblk = xt.shape[0]
    nb = _nb_for(d)
    gt = _to_blocked(g.astype(cdt), nb)

    blk = pl.BlockSpec((1, d, l * nb), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec(w.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM)

    dx_t, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, l=l, nb=nb, d=d, ff=ff,
                          heads=num_heads),
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

    dx = _from_blocked(dx_t, bp, nb)
    gr = _unpack_grads(dw, d, ff)
    h = num_heads
    hd = d // h
    return (dx,
            gr['dln1s'], gr['dln1b'],
            gr['dwq'].reshape(wq_shape), gr['dwk'].reshape(wq_shape),
            gr['dwv'].reshape(wq_shape),
            gr['dwo'].reshape(h, hd, d),
            gr['dln2s'], gr['dln2b'],
            gr['dw1'], gr['db1'], gr['dw2'], gr['db2'])


inner_layer.defvjp(_inner_fwd, _inner_bwd)


# ---------------------------------------------------------- jnp twin

def inner_layer_reference(x, ln1s, ln1b, wq, wk, wv, wo, ln2s, ln2b,
                          w1, b1, w2, b2, num_heads):
    """Pure-jnp twin in the model's layout, for equality tests."""
    bp, l, d = x.shape
    hd = d // num_heads

    def ln(a, s, b):
        af = a.astype(jnp.float32)
        mu = af.mean(-1, keepdims=True)
        var = jnp.maximum((af * af).mean(-1, keepdims=True) - mu * mu,
                          0.0)
        return ((af - mu) * jax.lax.rsqrt(var + LN_EPS) * s + b)

    cdt = x.dtype
    y = ln(x, ln1s, ln1b).astype(cdt)
    wq2 = wq.reshape(d, d).astype(cdt)
    wk2 = wk.reshape(d, d).astype(cdt)
    wv2 = wv.reshape(d, d).astype(cdt)
    wo2 = wo.reshape(d, d).astype(cdt)
    q = (y @ wq2).reshape(bp, l, num_heads, hd) / jnp.sqrt(
        jnp.asarray(hd, cdt))
    k = (y @ wk2).reshape(bp, l, num_heads, hd)
    v = (y @ wv2).reshape(bp, l, num_heads, hd)
    s = jnp.einsum('bqhc,bphc->bhqp', q, k,
                   preferred_element_type=jnp.float32)
    a = jax.nn.softmax(s, axis=-1).astype(cdt)
    o = jnp.einsum('bhqp,bphc->bqhc', a, v).reshape(bp, l, d)
    x2 = x + o @ wo2
    y2 = ln(x2, ln2s, ln2b).astype(cdt)
    hpre = y2 @ w1.astype(cdt) + b1.astype(cdt)
    return x2 + (jax.nn.gelu(hpre) @ w2.astype(cdt) + b2.astype(cdt))
