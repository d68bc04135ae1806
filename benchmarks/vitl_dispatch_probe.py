"""ViT-L @224 bs32 dispatch check: 6.3k rows is BELOW the fused-span win
region (TNT r4: lose at 12.6k rows, win at 25k) — does auto's fused
sublayer still beat per-op XLA at the zoo's smallest tracked row count?

Lanes: use_kernel='auto' (fused sublayer) vs False (per-op jnp/XLA).
Usage: python benchmarks/vitl_dispatch_probe.py [model] [batch]
"""
import sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, '.')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

MODEL = sys.argv[1] if len(sys.argv) > 1 else 'vit_l_patch16'
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 32
STEPS = 30

def bench(use_kernel):
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
    print(f'{MODEL} bs{BATCH} use_kernel={use_kernel}: '
          f'{best*1e3:.2f} ms/step {BATCH/best:.1f} img/s', flush=True)

for uk in ('auto', False):
    bench(uk)
