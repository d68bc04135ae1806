"""BoTNet train-step MFU receipt: XLA cost analysis + measured step time.

VERDICT r3 missing #2: botnet_t3's 1324 img/s row had no MFU estimate.
One chained fwd+bwd train-ish step (SGD carry) at the sweep config
(bs=64 @224, bf16), FLOPs from XLA's cost analysis, sustained TF/s and
MFU vs v5e's 197 TF/s bf16 peak printed.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

STEPS = 20


def main():
    from sav_tpu.models import factory
    bs, img = 64, 224
    model = factory.create_model('botnet_t3', num_classes=1000,
                                 dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (bs, img, img, 3),
                          jnp.bfloat16)
    labels = jax.random.randint(jax.random.PRNGKey(1), (bs,), 0, 1000)
    v = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(2), x[:1], is_training=True)
    params, rest = v['params'], {k: w for k, w in v.items()
                                 if k != 'params'}

    def loss_fn(p):
        logits, _ = model.apply({'params': p, **rest}, x,
                                is_training=True,
                                mutable=['batch_stats'])
        onehot = jax.nn.one_hot(labels, 1000)
        return -jnp.mean(jnp.sum(
            jax.nn.log_softmax(logits.astype(jnp.float32)) * onehot, -1))

    grad_fn = jax.grad(loss_fn)

    @jax.jit
    def run(p):
        def body(p, _):
            g = grad_fn(p)
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g), ()
        p, _ = jax.lax.scan(body, p, None, length=STEPS)
        return p

    single = jax.jit(lambda p: jax.tree_util.tree_map(
        lambda a, b: a - 1e-6 * b.astype(a.dtype), p, grad_fn(p)))
    cost = single.lower(params).compile().cost_analysis()
    flops = cost.get('flops', 0.0)

    out = run(params)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    best = float('inf')
    for _ in range(3):
        start = time.perf_counter()
        out = run(params)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      ).astype(jnp.float32))
        best = min(best, (time.perf_counter() - start) / STEPS)

    tf_s = flops / best / 1e12
    print(f'botnet_t3 @224 bs{bs}: {best * 1e3:.2f} ms/step, '
          f'{bs / best:.1f} img/s, {flops / 1e12:.2f} TF/step, '
          f'{tf_s:.1f} TF/s sustained, MFU {tf_s / 197 * 100:.1f}% '
          f'(v5e bf16 peak 197 TF/s)', flush=True)


if __name__ == '__main__':
    main()
