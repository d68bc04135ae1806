"""Fused-backward FF sublayer vs XLA autodiff at ViT-B @224 bs192 shapes
(M=37824 rows, D=768, F=3072). Lanes (fwd+bwd, scan-chained):

  xla FF      LN -> W1 -> gelu -> W2 -> +x, plain autodiff
  pallas FF   same forward; backward = ops.fused_layer._ff_bwd_pallas
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

B, L, D, F = 192, 197, 768, 3072
STEPS = 20


def main():
    from sav_tpu.ops import fused_layer as fl
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    x = jax.random.normal(ks[0], (B, L, D), jnp.bfloat16)
    p = {
        'scale': jnp.ones((D,)), 'bias': jnp.zeros((D,)),
        'w1': jax.random.normal(ks[1], (D, F), jnp.float32) / D ** .5,
        'b1': jnp.zeros((F,), jnp.float32),
        'w2': jax.random.normal(ks[2], (F, D), jnp.float32) / F ** .5,
        'b2': jnp.zeros((D,), jnp.float32),
    }

    def xla_ff(p, x):
        out, _ = fl._ff_fwd_res(x, p['scale'], p['bias'], p['w1'], p['b1'],
                                p['w2'], p['b2'], fl.LN_EPS, True)
        return out

    def pallas_ff(p, x):
        return fl.ff_sublayer(x, p['scale'], p['bias'], p['w1'], p['b1'],
                              p['w2'], p['b2'], fl.LN_EPS, True)

    for name, fn in (('xla FF', xla_ff), ('pallas FF', pallas_ff)):
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
            start = time.perf_counter()
            out = run(p, x)
            float(jnp.sum(out).astype(jnp.float32))
            best = min(best, (time.perf_counter() - start) / STEPS)
        print(f'{name:<12}{best * 1e3:8.3f} ms/layer  '
              f'x12 = {best * 12e3:7.1f} ms', flush=True)


if __name__ == '__main__':
    main()
