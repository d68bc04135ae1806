"""End-to-end receipt for the whole-FF int8 kernel: full ViT-B train step.

Same methodology as bench.py's `ours` lane (jit + scan-chained steps,
forced completion), comparing the production bf16 path against
``quantized='ff'`` (every encoder FF sublayer running the int8 Pallas
kernel, attention unchanged on the fused sublayer path).

Usage: python benchmarks/int8_e2e.py [bf16|int8-ff] [batch] [img]
(one lane per process — sequential lanes in one process stack HBM
allocations and OOM the chip, .claude/skills/verify/SKILL.md)
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

from sav_tpu.models import create_model
from sav_tpu.train import steps as steps_lib
from sav_tpu.train.state import TrainState, build_optimizer

SCAN_STEPS = 50


def _bench(model, batch_size, img):
    tx = build_optimizer(1e-3, weight_decay=1e-4)
    variables = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(0), jnp.ones((1, img, img, 3)),
        is_training=False)
    state = TrainState.create(variables, tx)
    rng = jax.random.PRNGKey(2)
    rngs = jax.random.split(jax.random.PRNGKey(1))
    batch = {
        'images': jax.random.uniform(rngs[0], (batch_size, img, img, 3)),
        'labels': jax.random.randint(rngs[1], (batch_size,), 0, 1000),
    }

    @jax.jit
    def run(state, batch):
        def body(carry, i):
            new_state, metrics = steps_lib.train_step(
                carry, batch, rng, model=model, tx=tx, num_classes=1000,
                label_smoothing=0.1)
            return new_state, metrics['loss']
        state, losses = jax.lax.scan(body, state, jnp.arange(SCAN_STEPS))
        return state, losses[-1]

    state2, loss = run(state, batch)
    float(loss)
    best = float('inf')
    for _ in range(3):
        start = time.perf_counter()
        _, loss = run(state, batch)
        float(loss)
        best = min(best, (time.perf_counter() - start) / SCAN_STEPS)
    return best


def main(lane='bf16', batch_size=192, img=224):
    kwargs = ({} if lane == 'bf16' else
              {'quantized': 'ff_sb' if lane == 'int8-sb' else 'ff'})
    model = create_model('vit_b_patch16', num_classes=1000,
                         dtype=jnp.bfloat16, **kwargs)
    s = _bench(model, batch_size, img)
    print(f'{lane:<8} {s * 1e3:8.2f} ms/step  '
          f'{batch_size / s:8.1f} img/s', flush=True)


if __name__ == '__main__':
    args = sys.argv[1:]
    main(*(args[:1] + [int(a) for a in args[1:3]]))
