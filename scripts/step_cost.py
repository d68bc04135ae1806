"""XLA cost-analysis FLOPs for a model's train step (ledger receipts).

Compiles the same train step bench.py times and prints the HLO flop
count, so a measured img/s row converts to sustained TF/s:

    sustained = flops_per_step * img_per_sec / batch / 1e12

Runs fine on the CPU backend (matmul flop totals are backend-invariant;
use the CPU env from .claude/skills/verify/SKILL.md to stay off the
chip while TPU queues run).

Usage: python scripts/step_cost.py <model> [batch] [img]
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, '.')


def main(model_name, batch, img):
    from sav_tpu.models import create_model
    from sav_tpu.train import steps as steps_lib
    from sav_tpu.train.state import TrainState, build_optimizer

    # use_kernel=False: Pallas custom calls report 0 flops to XLA cost
    # analysis, so the ledger counts the math on the pure-XLA twin (same
    # GEMMs/einsums; kernel paths change layout, not flop count)
    model = create_model(model_name, num_classes=1000, dtype=jnp.bfloat16,
                         use_kernel=False)
    tx = build_optimizer(1e-3, weight_decay=1e-4)
    variables = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(0), jnp.ones((1, img, img, 3)),
        is_training=False)
    state = TrainState.create(variables, tx)
    batch_d = {
        'images': jnp.zeros((batch, img, img, 3), jnp.float32),
        'labels': jnp.zeros((batch,), jnp.int32),
    }
    rng = jax.random.PRNGKey(1)

    def step(state, batch):
        new_state, metrics = steps_lib.train_step(
            state, batch, rng, model=model, tx=tx, num_classes=1000,
            label_smoothing=0.1)
        return new_state, metrics['loss']

    compiled = jax.jit(step).lower(state, batch_d).compile()
    flops = compiled.cost_analysis()['flops']
    print(f'{model_name} @{img} bs{batch}: {flops / 1e12:.3f} TF/step '
          f'({flops / batch / 1e9:.1f} GF/img fwd+bwd+opt)', flush=True)
    print('sustained TF/s at measured R img/s = '
          f'{flops / batch / 1e12:.6f} * R', flush=True)


if __name__ == '__main__':
    name = sys.argv[1]
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    img = int(sys.argv[3]) if len(sys.argv) > 3 else 224
    main(name, bs, img)
