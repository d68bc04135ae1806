"""Decompose the ViT-B @224 bs192 train step: where is the 10-15 ms of
backward scheduling slack BASELINE.md names (VERDICT r4 next-round #2)?

Phases (each its own process invocation — HBM allocations never stack):

  full    the shipped train step (fwd+bwd+optimizer), bench.py twin —
          reproduces the 160.8 ms headline
  fwd     loss only, no grad: the forward's share
  fwdbwd  value_and_grad, gradients folded to a scalar, NO optimizer
          update: fwd+bwd share (bwd = fwdbwd - fwd)
  opt     optimizer update alone on frozen grads (clip -> adam ->
          weight-decay -> schedule): the update's share
  donate  full step with the scan-carry state donated — can XLA alias
          the param/moment buffers across steps?
  nometrics  full step minus the top-1/5 metrics fold

Methodology per .claude/skills/verify/SKILL.md: 50-step lax.scan chains,
completion forced by scalar fetch, best of 3.

Usage: python benchmarks/vitb_slack_probe.py <phase> [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, '.')
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

STEPS = 50
MODEL = 'vit_b_patch16'
IMG = 224


def setup(batch_size):
    from sav_tpu.models import create_model
    from sav_tpu.train.state import TrainState, build_optimizer

    model = create_model(MODEL, num_classes=1000, dtype=jnp.bfloat16)
    tx = build_optimizer(1e-3, weight_decay=1e-4)
    variables = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(0), jnp.ones((1, IMG, IMG, 3)),
        is_training=False)
    state = TrainState.create(variables, tx)
    rngs = jax.random.split(jax.random.PRNGKey(1))
    batch = {
        'images': jax.random.uniform(rngs[0], (batch_size, IMG, IMG, 3)),
        'labels': jax.random.randint(rngs[1], (batch_size,), 0, 1000),
    }
    return model, tx, state, batch


def loss_pieces(model, batch):
    """The train step's exact loss (steps.py:96-102 semantics)."""
    from sav_tpu.train.steps import blended_targets

    def loss_fn(params, images):
        logits = model.apply({'params': params},
                             images.astype(model.dtype),
                             is_training=True,
                             rngs={'dropout': jax.random.PRNGKey(2),
                                   'stochastic_depth': jax.random.PRNGKey(3)},
                             mutable=False)
        logits = logits.astype(jnp.float32)
        targets = blended_targets(batch, 1000, 0.1)
        return jnp.mean(optax.softmax_cross_entropy(logits, targets))

    return loss_fn


def time_run(run, *args, fetch):
    out = run(*args)
    float(fetch(out))
    best = float('inf')
    for _ in range(3):
        del out
        start = time.perf_counter()
        out = run(*args)
        float(fetch(out))
        best = min(best, (time.perf_counter() - start) / STEPS)
    return best


def phase_full(batch_size, donate=False, metrics=True):
    from sav_tpu.train import steps as steps_lib
    model, tx, state, batch = setup(batch_size)
    rng = jax.random.PRNGKey(4)

    def step(state, batch, i):
        new_state, m = steps_lib.train_step(
            state, batch, rng, model=model, tx=tx, num_classes=1000,
            label_smoothing=0.1)
        return new_state, m['loss']

    def run(state, batch):
        def body(carry, i):
            return step(carry, batch, i)
        state, losses = jax.lax.scan(body, state, jnp.arange(STEPS))
        return state, losses[-1]

    if not donate:
        return time_run(jax.jit(run), state, batch, fetch=lambda o: o[1])

    runj = jax.jit(run, donate_argnums=(0,))
    state, loss = runj(state, batch)       # warmup (donates the original)
    float(loss)
    best = float('inf')
    for _ in range(3):
        start = time.perf_counter()
        state, loss = runj(state, batch)
        float(loss)
        best = min(best, (time.perf_counter() - start) / STEPS)
    return best


def phase_nometrics(batch_size):
    """Full update step, but no top-1/5 metric fold in the carry."""
    model, tx, state, batch = setup(batch_size)
    loss_fn = loss_pieces(model, batch)

    def run(state, batch):
        def body(carry, i):
            st = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                st.params, batch['images'])
            new_st = st.apply_gradients(tx, grads, None)
            return new_st, loss
        state, losses = jax.lax.scan(body, state, jnp.arange(STEPS))
        return state, losses[-1]

    return time_run(jax.jit(run), state, batch, fetch=lambda o: o[1])


def phase_fwd(batch_size):
    # params must be an ARGUMENT: closed-over trees become HLO constants
    # and the 330 MB blows the tunnel's remote_compile body limit (413)
    model, tx, state, batch = setup(batch_size)
    loss_fn = loss_pieces(model, batch)

    def run(params, images):
        def body(carry, i):
            loss = loss_fn(params, carry)
            # keep each iteration distinct so XLA can't hoist the body
            return carry + (loss * 1e-30).astype(carry.dtype), loss
        images, losses = jax.lax.scan(body, images, jnp.arange(STEPS))
        return losses[-1]

    return time_run(jax.jit(run), state.params, batch['images'],
                    fetch=lambda o: o)


def phase_fwdbwd(batch_size):
    model, tx, state, batch = setup(batch_size)
    loss_fn = loss_pieces(model, batch)

    def run(params, images):
        def body(carry, i):
            loss, grads = jax.value_and_grad(loss_fn)(params, carry)
            gsum = sum(jnp.sum(jnp.abs(g).astype(jnp.float32))
                       for g in jax.tree_util.tree_leaves(grads))
            return carry + (gsum * 1e-30).astype(carry.dtype), loss
        images, losses = jax.lax.scan(body, images, jnp.arange(STEPS))
        return losses[-1]

    return time_run(jax.jit(run), state.params, batch['images'],
                    fetch=lambda o: o)


def phase_opt(batch_size):
    model, tx, state, batch = setup(batch_size)
    grads = jax.tree_util.tree_map(
        lambda p: (1e-3 * jax.random.normal(
            jax.random.PRNGKey(5), p.shape)).astype(p.dtype), state.params)

    def run(state, grads):
        def body(carry, i):
            new_state = carry.apply_gradients(tx, grads, None)
            return new_state, ()
        state, _ = jax.lax.scan(body, state, jnp.arange(STEPS))
        return state
    return time_run(
        jax.jit(run), state, grads,
        fetch=lambda st: jnp.sum(
            jax.tree_util.tree_leaves(st.params)[0].astype(jnp.float32)))


PHASES = {
    'full': phase_full,
    'fwd': phase_fwd,
    'fwdbwd': phase_fwdbwd,
    'opt': phase_opt,
    'donate': lambda bs: phase_full(bs, donate=True),
    'nometrics': phase_nometrics,
}

if __name__ == '__main__':
    phase = sys.argv[1]
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 192
    ms = PHASES[phase](bs) * 1e3
    print(f'{MODEL} @{IMG} bs{bs} phase={phase}: {ms:8.2f} ms/step '
          f'({bs / ms * 1e3:8.1f} img/s)', flush=True)
