"""Re-measure TNT's fused OUTER sublayer now that the inner kernel landed.

Round 3 measured the fused outer sublayer as a ~0.4% LOSS on TNT-S @224
(507.5 vs 509.8 img/s) — but that was BEFORE the inner-transformer kernel
shrank the step from ~125 ms to ~40 ms. The outer attention's share of
the step has since tripled, so the boundary economics may have flipped.
This probe times the full train step with use_kernel='auto' (inner
kernel + per-op outer, the shipped route) vs 'fused_inner_outer' (inner
kernel + one custom_vjp per outer attention sublayer).

Usage: python benchmarks/tnt_outer_fused_probe.py [model] [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

MODEL = sys.argv[1] if len(sys.argv) > 1 else 'tnt_s_patch16'
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 64
IMG = 224
STEPS = 50


def bench(use_kernel):
    from sav_tpu.models import create_model
    from sav_tpu.train.state import TrainState, build_optimizer
    from sav_tpu.train import steps as steps_lib

    model = create_model(MODEL, num_classes=1000, dtype=jnp.bfloat16,
                         use_kernel=use_kernel)
    tx = build_optimizer(1e-3, weight_decay=1e-4)
    variables = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(0), jnp.ones((1, IMG, IMG, 3)),
        is_training=False)
    state = TrainState.create(variables, tx)
    rng = jax.random.PRNGKey(2)
    rngs = jax.random.split(jax.random.PRNGKey(1))
    batch = {
        'images': jax.random.uniform(rngs[0], (BATCH, IMG, IMG, 3)),
        'labels': jax.random.randint(rngs[1], (BATCH,), 0, 1000),
    }

    @jax.jit
    def run(state, batch):
        def body(carry, i):
            new_state, metrics = steps_lib.train_step(
                carry, batch, rng, model=model, tx=tx, num_classes=1000,
                label_smoothing=0.1)
            return new_state, metrics['loss']
        state, losses = jax.lax.scan(body, state, jnp.arange(STEPS))
        return state, losses[-1]

    state2, loss = run(state, batch)
    float(loss)
    best = float('inf')
    for _ in range(3):
        del state2
        start = time.perf_counter()
        state2, loss = run(state, batch)
        float(loss)
        best = min(best, (time.perf_counter() - start) / STEPS)
    del state2, state, batch, variables
    return best


for mode in ('auto', 'fused_inner_outer'):
    s = bench(mode)
    print(f'{MODEL} bs{BATCH} use_kernel={mode}: {s * 1e3:.2f} ms/step '
          f'{BATCH / s:.1f} img/s', flush=True)
