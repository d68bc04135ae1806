"""Talking-heads cost at CaiT-S24 region shapes (B=128, L=196, D=384,
H=8, d=48) — quantifies the ceiling of an in-kernel head-mix before any
kernel is built. Lanes (fwd+bwd, scan-chained):

  xla SA            the SA sublayer (LN->qkv->attn->proj->residual), no mix
  xla SA+TH         same with pre+post softmax talking-heads (CaiT layers)

The delta x 24 layers against the measured ~214 ms CaiT-S24 step bounds
the end-to-end win of folding the mixes into a fused kernel.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

B, L, D, H, HD = 128, 196, 384, 8, 48
if len(sys.argv) > 1:          # e.g. `cait_th_probe.py 48 577` for @384
    B, L = int(sys.argv[1]), int(sys.argv[2])
STEPS = 30


def sublayer(p, x, talking_heads):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mu * mu, 0.)
    y = ((xf - mu) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)
    q = jnp.einsum('bld,dhk->blhk', y, p['wq']) / jnp.sqrt(
        jnp.asarray(HD, x.dtype))
    k = jnp.einsum('bld,dhk->blhk', y, p['wk'])
    v = jnp.einsum('bld,dhk->blhk', y, p['wv'])
    s = jnp.einsum('bqhc,bphc->bhqp', q, k)     # [B, H, L, L]
    if talking_heads:
        s = jnp.einsum('hi,bhqp->biqp', p['m_pre'], s)
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(x.dtype)
    if talking_heads:
        a = jnp.einsum('hi,bhqp->biqp', p['m_post'], a)
    o = jnp.einsum('bhqp,bphc->bqhc', a, v)
    out = jnp.einsum('bqhc,hcd->bqd', o, p['wo'])
    return x + out.astype(x.dtype)


def main():
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (B, L, D), jnp.bfloat16)
    p = {
        'wq': jax.random.normal(ks[1], (D, H, HD), jnp.bfloat16) / D ** .5,
        'wk': jax.random.normal(ks[2], (D, H, HD), jnp.bfloat16) / D ** .5,
        'wv': jax.random.normal(ks[3], (D, H, HD), jnp.bfloat16) / D ** .5,
        'wo': jax.random.normal(ks[4], (H, HD, D), jnp.bfloat16) / D ** .5,
        'm_pre': jnp.eye(H, dtype=jnp.bfloat16),
        'm_post': jnp.eye(H, dtype=jnp.bfloat16),
    }

    from sav_tpu.ops import th_attention

    def fused_th(p, x):
        wq = p['wq']
        return x + th_attention.th_attention_sublayer(
            x, jnp.ones((D,)), jnp.zeros((D,)), wq, p['wk'], p['wv'],
            p['wo'], p['m_pre'].astype(jnp.float32),
            p['m_post'].astype(jnp.float32), H)

    fwd_only = '--fwd' in sys.argv
    lanes = [('xla SA', lambda p, x: sublayer(p, x, False)),
             ('xla SA+TH', lambda p, x: sublayer(p, x, True))]
    if th_attention.th_mode(L, H, HD) is not None:
        lanes.append(('fused TH', fused_th))
    for name, fn in lanes:
        def loss(p, x):
            return jnp.sum(jnp.square(fn(p, x).astype(jnp.float32)))
        grad_fn = jax.grad(loss, argnums=(0, 1))

        @jax.jit
        def run(p, x):
            def body(carry, _):
                p, x = carry
                if fwd_only:
                    return (p, x - 1e-6 * fn(p, x)), ()
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
            start = time.perf_counter()
            out = run(p, x)
            float(jnp.sum(out).astype(jnp.float32))
            best = min(best, (time.perf_counter() - start) / STEPS)
        print(f'grad {name:<12}{best * 1e3:8.3f} ms/layer  '
              f'x24 = {best * 24e3:7.1f} ms', flush=True)


if __name__ == '__main__':
    main()
