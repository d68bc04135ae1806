"""TNT inner attention: standard layout vs patches-in-lanes transpose.

The standard inner path materializes [B*P, H, 16, 16] logits — the TPU
pads the 16-wide lane dim to 128, an 8x memory/bandwidth expansion on
every intermediate (measured: 294 MB unpadded -> 2.30 GB padded in the
train step's HLO dump). The transposed formulation keeps B*P (12544) in
lanes so every tensor is naturally 128-aligned; the tiny 16x16x6
attention runs as batched-elementwise reductions instead of padded
matmuls. Lanes (fwd+bwd, scan-chained, B*P=12544, L=16, D=24, H=4):
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

BP, L, D, H = 64 * 196, 16, 24, 4
HD = D // H
STEPS = 30


def ln(a):
    mu = a.mean(-1, keepdims=True)
    var = jnp.maximum(
        (a.astype(jnp.float32) ** 2).mean(-1, keepdims=True)
        - mu.astype(jnp.float32) ** 2, 0.0)
    return ((a - mu) * jax.lax.rsqrt(var + 1e-6).astype(a.dtype))


def standard(p, x):
    """x [BP, L, D] — the reference/current layout."""
    y = ln(x)
    q = (y @ p['wq']).reshape(BP, L, H, HD) / jnp.sqrt(
        jnp.asarray(HD, x.dtype))
    k = (y @ p['wk']).reshape(BP, L, H, HD)
    v = (y @ p['wv']).reshape(BP, L, H, HD)
    s = jnp.einsum('bqhc,bphc->bhqp', q, k,
                   preferred_element_type=jnp.float32)
    a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum('bhqp,bphc->bqhc', a, v).reshape(BP, L, D)
    x = x + o @ p['wo']
    y2 = ln(x)
    h = jax.nn.gelu(y2 @ p['w1'])
    return x + h @ p['w2']


def transposed(p, x):
    """Same math, tokens/channels leading and B*P in lanes throughout."""
    # x [BP, L, D] -> [L, D, BP]; all intermediates keep BP last
    xt = jnp.transpose(x, (1, 2, 0))
    mu = xt.mean(1, keepdims=True)
    var = jnp.maximum((xt.astype(jnp.float32) ** 2).mean(1, keepdims=True)
                      - mu.astype(jnp.float32) ** 2, 0.0)
    yt = (xt - mu) * jax.lax.rsqrt(var + 1e-6).astype(xt.dtype)
    # projections: contract D -> [L, D', BP]
    q = jnp.einsum('ldb,dc->lcb', yt, p['wq']) / jnp.sqrt(
        jnp.asarray(HD, x.dtype))
    k = jnp.einsum('ldb,dc->lcb', yt, p['wk'])
    v = jnp.einsum('ldb,dc->lcb', yt, p['wv'])
    qh = q.reshape(L, H, HD, BP)
    kh = k.reshape(L, H, HD, BP)
    vh = v.reshape(L, H, HD, BP)
    # logits [q, p, H, BP]: contract the tiny HD axis, BP stays in lanes
    s = jnp.einsum('qhcb,phcb->qphb', qh, kh,
                   preferred_element_type=jnp.float32)
    a = jax.nn.softmax(s, axis=1).astype(x.dtype)
    o = jnp.einsum('qphb,phcb->qhcb', a, vh).reshape(L, D, BP)
    ot = jnp.einsum('lcb,cd->ldb', o, p['wo'])
    xt = xt + ot
    mu2 = xt.mean(1, keepdims=True)
    var2 = jnp.maximum((xt.astype(jnp.float32) ** 2).mean(1, keepdims=True)
                       - mu2.astype(jnp.float32) ** 2, 0.0)
    y2 = (xt - mu2) * jax.lax.rsqrt(var2 + 1e-6).astype(xt.dtype)
    h = jax.nn.gelu(jnp.einsum('ldb,df->lfb', y2, p['w1']))
    xt = xt + jnp.einsum('lfb,fd->ldb', h, p['w2'])
    return jnp.transpose(xt, (2, 0, 1))


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    x = jax.random.normal(ks[0], (BP, L, D), jnp.bfloat16) * 0.1
    p = {'wq': jax.random.normal(ks[1], (D, D), jnp.bfloat16) / D ** .5,
         'wk': jax.random.normal(ks[2], (D, D), jnp.bfloat16) / D ** .5,
         'wv': jax.random.normal(ks[3], (D, D), jnp.bfloat16) / D ** .5,
         'wo': jax.random.normal(ks[4], (D, D), jnp.bfloat16) / D ** .5,
         'w1': jax.random.normal(ks[5], (D, 4 * D), jnp.bfloat16) / D ** .5,
         'w2': jax.random.normal(ks[6], (4 * D, D), jnp.bfloat16) / 10.}

    # numerics first
    a = standard(p, x).astype(jnp.float32)
    b = transposed(p, x).astype(jnp.float32)
    err = float(jnp.abs(a - b).max() / jnp.abs(a).max())
    print(f'layout parity: rel {err:.2e}', flush=True)

    for name, fn in (('standard', standard), ('transposed', transposed)):
        def loss(p, x):
            return jnp.sum(jnp.square(fn(p, x).astype(jnp.float32)))
        grad_fn = jax.grad(loss, argnums=(0, 1))

        @jax.jit
        def run(p, x):
            def body(carry, _):
                p, x = carry
                gp, gx = grad_fn(p, x)
                p = jax.tree_util.tree_map(
                    lambda a, g: a - 1e-6 * g.astype(a.dtype), p, gp)
                return (p, x - 1e-6 * gx.astype(x.dtype)), ()
            (p, x), _ = jax.lax.scan(body, (p, x), None, length=STEPS)
            return x
        out = run(p, x)
        float(jnp.sum(out).astype(jnp.float32))
        best = float('inf')
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(p, x)
            float(jnp.sum(out).astype(jnp.float32))
            best = min(best, (time.perf_counter() - t0) / STEPS)
        print(f'{name:<11}{best*1e3:8.3f} ms/layer  x12 = {best*12e3:6.1f} ms',
              flush=True)


if __name__ == '__main__':
    main()
