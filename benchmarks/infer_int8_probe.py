"""Inference (forward-only) throughput: bf16 vs int8-FF ViT-B/16 @224.

Training integration of int8 loses to the QAT backward's unfused passes
(docs/PERFORMANCE.md), but inference has no backward and no custom_vjp
residual boundary — the isolated int8-FF forward won 1.33x, so serving
is where the int8 MXU rate (measured ~269 TOPS vs ~160 TFLOP/s bf16)
can actually pay. Scan-chained batches, completion forced by scalar
fetch (the tunnel returns at enqueue).
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

BS = 256
STEPS = 20


def lane(name, quantized):
    from sav_tpu.models import factory
    model = factory.create_model('vit_b_patch16', num_classes=1000,
                                 dtype=jnp.bfloat16, quantized=quantized)
    x = jax.random.normal(jax.random.PRNGKey(0), (BS, 224, 224, 3),
                          jnp.bfloat16)
    v = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(1), x[:1], is_training=False)

    @jax.jit
    def run(v, x):
        def body(carry, _):
            logits = model.apply(v, carry, is_training=False)
            # feed a logits-dependent perturbation so steps chain
            bump = jnp.sum(logits).astype(carry.dtype) * 1e-12
            return carry + bump, ()
        out, _ = jax.lax.scan(body, x, None, length=STEPS)
        return out

    out = run(v, x)
    float(jnp.sum(out).astype(jnp.float32))
    best = float('inf')
    for _ in range(3):
        start = time.perf_counter()
        out = run(v, x)
        float(jnp.sum(out).astype(jnp.float32))
        best = min(best, (time.perf_counter() - start) / STEPS)
    print(f'{name:<10} {best * 1e3:8.2f} ms/batch  '
          f'{BS / best:9.1f} img/s', flush=True)
    return BS / best


def main():
    bf16 = lane('bf16', False)
    int8 = lane('int8-ff', 'ff')
    print(f'int8-ff / bf16 = {int8 / bf16:.3f}x', flush=True)
    q8 = lane('int8-all', 'all')      # + int8 attention projections
    print(f'int8-all / bf16 = {q8 / bf16:.3f}x', flush=True)


if __name__ == '__main__':
    main()
