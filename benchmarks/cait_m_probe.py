"""cait_m_48 @224 TH-mode probe (round-5 sweep found 0.84x at bs16).

cait_m (d=768, h=16) routes th_mode='blocked' at L=196 — a core built
and receipted for @384 shapes, never measured at @224. The 'fused'
single-block core misses the 3 MB list cap by 13% (16 heads x [208,256]
f32 logit tiles = 3.41 MB). Lanes:

  auto    whatever th_mode picks today ('blocked' here)
  off     use_kernel=False — per-op jnp/XLA twin
  fused   _MAX_LIST_BYTES raised so th_mode returns 'fused'

Usage: python benchmarks/cait_m_probe.py <auto|off|fused> [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

MODE = sys.argv[1] if len(sys.argv) > 1 else 'auto'
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 16
STEPS = 30
MODEL = 'cait_m_48'


def main():
    from sav_tpu.ops import th_attention as th
    if MODE == 'fused':
        th._MAX_LIST_BYTES = 4 * 1024 * 1024
        assert th.th_mode(196, 16, 48) == 'fused'
    use_kernel = False if MODE == 'off' else 'auto'

    from sav_tpu.models import create_model
    model = create_model(MODEL, num_classes=1000, dtype=jnp.bfloat16,
                         use_kernel=use_kernel)
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, 224, 224, 3),
                          jnp.bfloat16)
    y = jax.random.randint(jax.random.PRNGKey(1), (BATCH,), 0, 1000)
    v = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(2), x[:1], is_training=False)

    def loss(p):
        logits = model.apply(p, x, is_training=False)
        oh = jax.nn.one_hot(y, 1000)
        return -jnp.mean(jnp.sum(
            jax.nn.log_softmax(logits.astype(jnp.float32)) * oh, -1))
    g = jax.grad(loss)

    @jax.jit
    def run(p):
        def body(p, _):
            return jax.tree_util.tree_map(
                lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g(p)), ()
        p, _ = jax.lax.scan(body, p, None, length=STEPS)
        return p

    out = run(v)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(v)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]
                      ).astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / STEPS)
    print(f'{MODEL} bs{BATCH} mode={MODE}: {best*1e3:.2f} ms/step '
          f'{BATCH/best:.1f} img/s', flush=True)


main()
