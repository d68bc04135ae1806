"""Prototype: TNT inner layer as ONE Pallas kernel, patches-in-lanes.

The standard inner layer burns ~9 ms/layer (probe) on [B*P, 16, 24]
tensors whose 16/24-wide lane dims pad to 128 (8x bandwidth) — the HLO
dump shows 2.3 GB buffers holding 294 MB of data. This kernel stores a
block of NB patches TRANSPOSED as [D=24, L*NB] (d in sublanes, lane =
l*NB + b), so every tensor is naturally lane-aligned:

  * LN over d       = sublane reduction on [24, L*NB]
  * projections     = ONE MXU matmul [24(or 96), 24] @ [24, L*NB]
  * attention       = per-(q,h) unrolled VPU multiply + sublane-sum over
                      the tiny c=6 axis; probs [16, NB] per (q,h)
  * FF              = [96,24]/[24,96] matmuls + gelu on [96, L*NB]

Forward only — measures the layout hypothesis before building the
backward. Compares against the XLA standard-layout forward at
B*P=12544, L=16, D=24, H=4 (TNT-S @224 bs64 shapes).
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, '.')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

BP, L, D, H = 64 * 196, 16, 24, 4
HD = D // H
NB = 896                  # patches per grid block (12544 = 14 x 896)
FF = 4 * D
STEPS = 30


def _ln_rows(x, scale, bias, eps=1e-6):
    """LN over the sublane (d) axis of [D, N]."""
    mu = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=0, keepdims=True) - mu * mu,
                      0.0)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _fwd_kernel(x_ref, ln1s_ref, ln1b_ref, wq_ref, wk_ref, wv_ref,
                wo_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref, w2_ref,
                b2_ref, out_ref):
    x = x_ref[0].astype(jnp.float32)          # [D, L*NB]
    y = _ln_rows(x, ln1s_ref[...], ln1b_ref[...])

    sc = 1.0 / (HD ** 0.5)
    yb = y.astype(x_ref.dtype)
    q = (fa_mm(wq_ref[...], yb) * sc)         # [D, L*NB] f32
    k = fa_mm(wk_ref[...], yb)
    v = fa_mm(wv_ref[...], yb)

    lane = lambda a, l: a[:, l * NB:(l + 1) * NB]
    head = lambda a, h: a[h * HD:(h + 1) * HD]

    o = []
    for h in range(H):
        qh = head(q, h)                       # [HD, L*NB]
        kh = head(k, h)
        vh = head(v, h)
        oh_rows = [None] * L
        for ql in range(L):
            qv = lane(qh, ql)                 # [HD, NB]
            # logits rows: s[p] = sum_c q[c]*k[c, p-lane]
            s = jnp.concatenate(
                [jnp.sum(qv * lane(kh, p), axis=0, keepdims=True)
                 for p in range(L)], axis=0)  # [L, NB] f32
            m = jnp.max(s, axis=0, keepdims=True)
            e = jnp.exp(s - m)
            a = e / jnp.sum(e, axis=0, keepdims=True)
            # o[c] = sum_p a[p] * v[c, p-lane]
            acc = a[0:1] * lane(vh, 0)
            for p in range(1, L):
                acc = acc + a[p:p + 1] * lane(vh, p)
            oh_rows[ql] = acc                 # [HD, NB]
        o.append(jnp.concatenate(oh_rows, axis=1))   # [HD, L*NB]
    ob = jnp.concatenate(o, axis=0).astype(x_ref.dtype)  # [D, L*NB]

    attn_out = fa_mm(wo_ref[...], ob)
    x2 = x + attn_out
    y2 = _ln_rows(x2, ln2s_ref[...], ln2b_ref[...]).astype(x_ref.dtype)
    h1 = fa_mm(w1_ref[...], y2) + b1_ref[...]
    g = jax.nn.gelu(h1).astype(x_ref.dtype)
    out = x2 + fa_mm(w2_ref[...], g) + b2_ref[...]
    out_ref[0] = out.astype(out_ref.dtype)


def fa_mm(w, x):
    """w [M, K] @ x [K, N] with f32 accumulation."""
    return jax.lax.dot_general(w, x, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def inner_layer_kernel(xt, p):
    """xt [NBLK, D, L*NB] blocked-transposed activations."""
    nblk = xt.shape[0]
    cdt = xt.dtype
    col = lambda a: a.astype(jnp.float32).reshape(D, 1)
    colf = lambda a, n: a.astype(jnp.float32).reshape(n, 1)
    blk = pl.BlockSpec((1, D, L * NB), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    wspec = lambda m, k: pl.BlockSpec((m, k), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    vspec = lambda m: pl.BlockSpec((m, 1), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _fwd_kernel,
        grid=(nblk,),
        in_specs=[blk, vspec(D), vspec(D), wspec(D, D), wspec(D, D),
                  wspec(D, D), wspec(D, D), vspec(D), vspec(D),
                  wspec(FF, D), vspec(FF), wspec(D, FF), vspec(D)],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(xt.shape, cdt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=jax.default_backend() != 'tpu',
    )(xt, col(p['ln1s']), col(p['ln1b']),
      p['wq'].T.astype(cdt), p['wk'].T.astype(cdt),
      p['wv'].T.astype(cdt), p['wo'].T.astype(cdt),
      col(p['ln2s']), col(p['ln2b']),
      p['w1'].T.astype(cdt), colf(p['b1'], FF),
      p['w2'].T.astype(cdt), colf(p['b2'], D))


def standard_fwd(p, x):
    """Reference semantics on [BP, L, D] (the current model layout)."""
    def ln(a, s, b):
        mu = a.mean(-1, keepdims=True)
        var = jnp.maximum(
            (a.astype(jnp.float32) ** 2).mean(-1, keepdims=True)
            - mu.astype(jnp.float32) ** 2, 0.0)
        return ((a - mu) * jax.lax.rsqrt(var + 1e-6).astype(a.dtype)
                * s + b)
    y = ln(x, p['ln1s'], p['ln1b'])
    q = (y @ p['wq']).reshape(BP, L, H, HD) / jnp.sqrt(
        jnp.asarray(HD, x.dtype))
    k = (y @ p['wk']).reshape(BP, L, H, HD)
    v = (y @ p['wv']).reshape(BP, L, H, HD)
    s = jnp.einsum('bqhc,bphc->bhqp', q, k,
                   preferred_element_type=jnp.float32)
    a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum('bhqp,bphc->bqhc', a, v).reshape(BP, L, D)
    x = x + o @ p['wo']
    y2 = ln(x, p['ln2s'], p['ln2b'])
    h = jax.nn.gelu(y2 @ p['w1'] + p['b1'])
    return x + (h @ p['w2'] + p['b2'])


def to_blocked(x):
    """[BP, L, D] -> [NBLK, D, L*NB] (lane = l*NB + b within a block)."""
    nblk = BP // NB
    # [nblk, NB, L, D] -> [nblk, D, L, NB] -> [nblk, D, L*NB]
    return jnp.transpose(x.reshape(nblk, NB, L, D), (0, 3, 2, 1)) \
              .reshape(nblk, D, L * NB)


def from_blocked(xt):
    nblk = xt.shape[0]
    return jnp.transpose(xt.reshape(nblk, D, L, NB), (0, 3, 2, 1)) \
              .reshape(BP, L, D)


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 9)
    x = jax.random.normal(ks[0], (BP, L, D), jnp.bfloat16) * 0.1
    mk = lambda i, *s: jax.random.normal(ks[i], s, jnp.float32) / (
        s[0] ** 0.5)
    p = {'ln1s': jnp.ones((D,)), 'ln1b': jnp.zeros((D,)),
         'wq': mk(1, D, D), 'wk': mk(2, D, D), 'wv': mk(3, D, D),
         'wo': mk(4, D, D), 'ln2s': jnp.ones((D,)),
         'ln2b': jnp.zeros((D,)), 'w1': mk(5, D, FF),
         'b1': jnp.zeros((FF,)), 'w2': mk(6, FF, D),
         'b2': jnp.zeros((D,))}
    pb = {k: v.astype(jnp.bfloat16) if v.ndim == 2 else v
          for k, v in p.items()}

    # numerics
    want = standard_fwd(pb, x).astype(jnp.float32)
    got = from_blocked(inner_layer_kernel(to_blocked(x), p)) \
        .astype(jnp.float32)
    err = float(jnp.abs(got - want).max() / jnp.abs(want).max())
    print(f'kernel vs standard fwd: rel {err:.2e}', flush=True)

    lanes = (
        ('xla standard', lambda x: standard_fwd(pb, x)),
        ('pallas inner', lambda x: from_blocked(
            inner_layer_kernel(to_blocked(x), p))),
        ('pallas (pre-blocked)', None),   # filled below
    )

    def time_fn(name, fn, x0):
        @jax.jit
        def run(x):
            def body(c, _):
                return c + 1e-6 * fn(c).astype(c.dtype), ()
            out, _ = jax.lax.scan(body, x0, None, length=STEPS)
            return out
        out = run(x0)
        float(jnp.sum(out).astype(jnp.float32))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(x0)
            float(jnp.sum(out).astype(jnp.float32))
            best = min(best, (time.perf_counter() - t0) / STEPS)
        print(f'{name:<22}{best*1e3:8.3f} ms/layer fwd', flush=True)

    time_fn('xla standard', lambda a: standard_fwd(pb, a), x)
    time_fn('pallas inner+convert',
            lambda a: from_blocked(inner_layer_kernel(to_blocked(a), p)),
            x)
    time_fn('pallas pre-blocked',
            lambda a: inner_layer_kernel(a, p), to_blocked(x))


if __name__ == '__main__':
    main()
