"""Forward-only (serving) throughput sweep across the model zoo.

Same methodology as ``infer_int8_probe.py`` (jit + scan-chained batches,
completion forced by scalar fetch — the tunnel returns at enqueue), one
model per process invocation so HBM allocations never stack
(.claude/skills/verify/SKILL.md).

Usage:  python benchmarks/serve_sweep.py <model> [batch] [img] [quantized]
        python benchmarks/serve_sweep.py --list
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

STEPS = 20

# (model, batch, img) — serving-shaped batches; batch sized so every
# model fits one v5e chip with margin
CONFIGS = [
    ('vit_b_patch16', 256, 224),
    ('vit_b_patch16', 64, 384),
    ('vit_l_patch16', 128, 224),
    ('cait_s_24', 256, 224),
    ('ceit_s', 128, 224),
    ('cvt-13', 256, 224),
    ('tnt_s_patch16', 128, 224),
    ('mixer_b_patch16', 256, 224),
    ('botnet_t3', 128, 224),
]


def lane(model_name, bs, img, quantized):
    from sav_tpu.models import factory
    kwargs = {'quantized': quantized} if quantized else {}
    model = factory.create_model(model_name, num_classes=1000,
                                 dtype=jnp.bfloat16, **kwargs)
    x = jax.random.normal(jax.random.PRNGKey(0), (bs, img, img, 3),
                          jnp.bfloat16)
    v = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(1), x[:1], is_training=False)

    @jax.jit
    def run(v, x):
        def body(carry, _):
            logits = model.apply(v, carry, is_training=False)
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
    tag = f'{model_name}@{img} bs{bs}' + (f' q8:{quantized}'
                                          if quantized else '')
    print(f'{tag:<40} {best * 1e3:8.2f} ms/batch  {bs / best:9.1f} img/s',
          flush=True)


if __name__ == '__main__':
    if '--list' in sys.argv:
        for m, b, i in CONFIGS:
            print(m, b, i)
        sys.exit(0)
    args = sys.argv[1:]
    name = args[0]
    bs, img = (int(a) for a in args[1:3]) if len(args) >= 3 else next(
        (b, i) for m, b, i in CONFIGS if m == name)
    quantized = args[3] if len(args) > 3 else None
    lane(name, bs, img, quantized)
