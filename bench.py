"""Headline benchmark: ViT-B/16 @224 train-step images/sec/chip.

Measures our framework's train step and, as the baseline, the reference
implementation's own model (imported from /root/reference) driven by an
equivalent fwd/bwd/adam step — i.e. "reference-JAX images/sec/chip" per
BASELINE.json. Prints one JSON line.

Methodology: K steps are chained inside ONE jit via lax.scan and completion
is forced by fetching a scalar that depends on the final state — on tunneled
TPU targets `block_until_ready` returns at enqueue time and per-dispatch
overhead is ~tens of ms, so per-step python dispatch would measure the
tunnel, not the chip.
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import optax

MODEL_NAME = 'vit_b_patch16'
IMG = 224
SCAN_STEPS = 50


def _batch(batch_size, seed=1):
    rngs = jax.random.split(jax.random.PRNGKey(seed))
    return {
        'images': jax.random.uniform(rngs[0], (batch_size, IMG, IMG, 3)),
        'labels': jax.random.randint(rngs[1], (batch_size,), 0, 1000),
    }


def _time_scan(step_fn, state, batch, steps=SCAN_STEPS, repeats=3):
    """step_fn(state, batch, step_index) -> (state, loss). Returns s/step."""

    @jax.jit
    def run(state, batch):
        def body(carry, i):
            new_state, loss = step_fn(carry, batch, i)
            return new_state, loss
        state, losses = jax.lax.scan(body, state, jnp.arange(steps))
        return state, losses[-1]

    state2, loss = run(state, batch)          # compile + warmup
    float(loss)                               # force completion
    best = float('inf')
    for _ in range(repeats):
        start = time.perf_counter()
        state2, loss = run(state, batch)
        float(loss)                           # forces the whole chain
        best = min(best, (time.perf_counter() - start) / steps)
    return best


def bench_ours(batch_size):
    from sav_tpu.models import create_model
    from sav_tpu.train.state import TrainState, build_optimizer
    from sav_tpu.train import steps as steps_lib

    model = create_model(MODEL_NAME, num_classes=1000, dtype=jnp.bfloat16)
    tx = build_optimizer(1e-3, weight_decay=1e-4)
    variables = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(0), jnp.ones((1, IMG, IMG, 3)),
        is_training=False)
    state = TrainState.create(variables, tx)
    rng = jax.random.PRNGKey(2)

    def step(state, batch, i):
        new_state, metrics = steps_lib.train_step(
            state, batch, rng, model=model, tx=tx, num_classes=1000,
            label_smoothing=0.1)
        return new_state, metrics['loss']

    return _time_scan(step, state, _batch(batch_size))


def bench_reference(batch_size):
    """Reference model + reference-equivalent train step."""
    if '/root/reference' not in sys.path:
        sys.path.insert(0, '/root/reference')
    import models as reference_models

    model = reference_models.create_model(MODEL_NAME, num_classes=1000,
                                          dtype=jnp.bfloat16)
    tx = optax.chain(optax.scale_by_adam(),
                     optax.add_decayed_weights(1e-4),
                     optax.scale(-1e-3))
    variables = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(0), jnp.ones((1, IMG, IMG, 3)),
        is_training=False)
    opt_state = tx.init(variables)

    def step(state, batch, i):
        variables, opt_state = state

        def loss_fn(variables):
            logits = model.apply(variables,
                                 batch['images'].astype(jnp.bfloat16),
                                 is_training=True)
            y = optax.smooth_labels(
                jax.nn.one_hot(batch['labels'], 1000), 0.1)
            loss = jnp.mean(optax.softmax_cross_entropy(
                logits.astype(jnp.float32), y))
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn,
                                                    has_aux=True)(variables)
        # the reference computes top-1/5 inside its train step via a full
        # argsort + per-row isin (reference: train.py:98, utils.py:20-37)
        argsorted = jnp.argsort(logits)
        for k_top in (1, 5):
            pred = argsorted[..., -k_top:]
            correct = jax.vmap(jnp.isin)(pred, batch['labels']).any(axis=-1)
            # fold into the carried scalar at negligible weight so XLA
            # cannot dead-code-eliminate the metric computation
            loss = loss + 1e-30 * correct.astype(jnp.float32).mean()
        updates, new_opt = tx.update(grads, opt_state, variables)
        return (optax.apply_updates(variables, updates), new_opt), loss

    return _time_scan(step, (variables, opt_state), _batch(batch_size))


def main():
    # bs=192 is the measured throughput-optimal batch that still fits HBM
    # for both implementations on a single v5e chip (987 vs 832 img/s at
    # bs=128 for the identical graph)
    batch_size = 192 if jax.default_backend() == 'tpu' else 8
    ours = bench_ours(batch_size)
    ref = bench_reference(batch_size)
    ours_ips = batch_size / ours
    ref_ips = batch_size / ref
    print(json.dumps({
        'metric': f'images/sec/chip {MODEL_NAME} @{IMG} train step '
                  f'(bs={batch_size}, {jax.default_backend()})',
        'value': round(ours_ips, 2),
        'unit': 'images/sec/chip',
        'vs_baseline': round(ours_ips / ref_ips, 4),
    }))


if __name__ == '__main__':
    main()
