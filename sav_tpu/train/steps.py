"""Jitted, mesh-sharded train and eval steps.

TPU-native replacement for the reference's pmap steps (reference:
train.py:77-120): one ``jax.jit`` over an explicit ``Mesh`` with
NamedShardings. The batch is sharded over the ``data`` axis; parameters and
optimizer state follow the tensor-parallel rules in ``sav_tpu.parallel.mesh``
(fully replicated when the model axis is 1). GSPMD inserts the gradient
all-reduce that pmap expressed as ``lax.pmean`` (train.py:96) — the loss is a
mean over the *global* batch, so no 1/device_count scaling trick is needed.

RNG plumbing: dropout and stochastic-depth streams are folded in from the
step counter, deterministic under any sharding — the reference never passed
these streams at all (SURVEY §3.4), so CaiT-style training crashed there.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sav_tpu.parallel import mesh as mesh_lib
from sav_tpu.train.state import TrainState
from sav_tpu.utils.metrics import topk_correct


def blended_targets(batch: Dict[str, jax.Array], num_classes: int,
                    label_smoothing: float) -> jax.Array:
    """One-hot targets with optional mixup/cutmix blending and smoothing.

    Batch schema matches the reference (train.py:84-88):
    ``labels`` plus optional ``mix_labels`` and per-example ``ratio``.
    """
    y = jax.nn.one_hot(batch['labels'], num_classes)
    if 'mix_labels' in batch:
        y_mix = jax.nn.one_hot(batch['mix_labels'], num_classes)
        ratio = batch['ratio'][:, None]
        y = ratio * y + (1.0 - ratio) * y_mix
    if label_smoothing:
        y = optax.smooth_labels(y, label_smoothing)
    return y


# Rematerialization modes for the backward pass: True/'full' recomputes the
# whole forward (max memory savings, ~30%+ recompute cost); 'dots' saves all
# matmul outputs and recomputes only elementwise ops (LN/gelu/softmax — cheap
# VPU recompute, frees the elementwise intermediates); 'dots_no_batch'
# additionally recomputes batched matmuls (the attention logits/value
# einsums), the standard transformer policy — activations kept are just the
# projection outputs.
REMAT_POLICIES = {
    'full': None,
    'dots': jax.checkpoint_policies.checkpoint_dots,
    'dots_no_batch': jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
}


def apply_remat(forward, remat):
    """Wraps ``forward`` in jax.checkpoint per a remat mode (bool or name)."""
    if not remat:
        return forward
    policy = REMAT_POLICIES[remat if isinstance(remat, str) else 'full']
    return jax.checkpoint(forward, policy=policy)


def train_step(state: TrainState, batch: Dict[str, jax.Array],
               rng: jax.Array, *, model, tx, num_classes: int,
               label_smoothing: float, remat: bool | str = False,
               ema_decay=None, grad_accum: int = 1):
    """One optimizer step; returns (new_state, metrics).

    ``grad_accum > 1`` splits the batch into that many microbatches and
    accumulates gradients over a ``lax.scan`` before the single optimizer
    update — the effective batch trains with 1/grad_accum of the
    activation memory (the reference has no equivalent; its batch is
    whatever fits). Equal-size microbatches make mean-of-means the exact
    global mean, so the update equals the unaccumulated one up to
    float summation order. BatchNorm stats thread through the scan
    sequentially (same semantics as consecutive smaller steps).
    """
    step_rng = jax.random.fold_in(rng, state.step)

    def forward(params, stats, images, rngs):
        variables = {'params': params}
        if stats:
            variables['batch_stats'] = stats
        return model.apply(variables, images, is_training=True,
                           rngs=rngs, mutable=['batch_stats'])

    forward = apply_remat(forward, remat)

    def loss_fn(params, stats, mb, rngs):
        images = mb['images'].astype(model.dtype)
        logits, updates = forward(params, stats, images, rngs)
        logits = logits.astype(jnp.float32)
        targets = blended_targets(mb, num_classes, label_smoothing)
        loss = jnp.mean(optax.softmax_cross_entropy(logits, targets))
        return loss, (logits, updates.get('batch_stats'))

    def rngs_of(base):
        return {'dropout': jax.random.fold_in(base, 0),
                'stochastic_depth': jax.random.fold_in(base, 1)}

    def micro_rngs(i):
        # distinct dropout noise per microbatch; i==0 is NOT the plain
        # path's stream on purpose (fold_in(step_rng, i) would collide
        # with the step counter fold when i > 0)
        return rngs_of(jax.random.fold_in(step_rng, jnp.asarray(2) + i))

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    if grad_accum == 1:
        (loss, (logits, new_stats)), grads = grad_fn(
            state.params, state.batch_stats, batch, rngs_of(step_rng))
        metrics = {'loss': loss}
        acc = topk_correct(logits, batch['labels'], prefix='train_')
        metrics.update(jax.tree_util.tree_map(jnp.mean, acc))
    else:
        b = batch['images'].shape[0]
        if b % grad_accum:
            raise ValueError(f'batch {b} not divisible by '
                             f'grad_accum {grad_accum}')
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape(grad_accum, b // grad_accum, *x.shape[1:]),
            batch)

        def body(carry, mb_i):
            stats, grads_acc, sums = carry
            mb, i = mb_i
            (loss, (logits, new_stats)), grads = grad_fn(
                state.params, stats, mb, micro_rngs(i))
            grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
            part = {'loss': loss}
            acc = topk_correct(logits, mb['labels'], prefix='train_')
            part.update(jax.tree_util.tree_map(jnp.mean, acc))
            sums = jax.tree_util.tree_map(jnp.add, sums, part)
            if stats:
                stats = new_stats
            return (stats, grads_acc, sums), ()

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
        zero_sums = {'loss': jnp.zeros((), jnp.float32),
                     'train_top_1_acc': jnp.zeros((), jnp.float32),
                     'train_top_5_acc': jnp.zeros((), jnp.float32)}
        (new_stats, grads, sums), _ = jax.lax.scan(
            body, (state.batch_stats, zeros, zero_sums),
            (micro, jnp.arange(grad_accum)))
        inv = 1.0 / grad_accum
        grads = jax.tree_util.tree_map(
            lambda g, p: (g * inv).astype(p.dtype), grads, state.params)
        metrics = jax.tree_util.tree_map(lambda s: s * inv, sums)

    new_state = state.apply_gradients(tx, grads, new_stats,
                                      ema_decay=ema_decay)
    return new_state, metrics


def eval_step(state: TrainState, batch: Dict[str, jax.Array], *, model,
              num_classes: int, use_ema: bool = False):
    """Summed loss/correct counts over valid examples (mask-aware so padded
    eval batches don't skew the average)."""
    images = batch['images'].astype(model.dtype)
    logits = model.apply(state.variables(use_ema=use_ema), images,
                         is_training=False)
    logits = logits.astype(jnp.float32)
    y = jax.nn.one_hot(batch['labels'], num_classes)
    per_example = optax.softmax_cross_entropy(logits, y)
    mask = batch.get('mask')
    if mask is None:
        mask = jnp.ones(per_example.shape[0], jnp.float32)
    acc = topk_correct(logits, batch['labels'], mask=mask, prefix='eval_')
    sums = {'eval_loss': jnp.sum(per_example * mask),
            'eval_count': jnp.sum(mask)}
    sums.update({k: jnp.sum(v) for k, v in acc.items()})
    return sums


def _tree_shardings(mesh: Mesh, tree):
    """NamedShardings for any pytree, by tensor/pipeline-parallel path rules.

    Tensor-parallel specs follow ``mesh_lib.param_spec``; when the mesh has
    a ``pipe`` axis, scan-stacked encoder-layer leaves (path contains
    ``['EncoderBlock']``, leading axis = layer) are additionally sharded
    over it — the stage shard the GPipe schedule consumes directly.
    Optimizer moments mirror the same paths, so they distribute too.
    """
    sizes = dict(mesh.shape)
    pipe = sizes.get(mesh_lib.PIPE_AXIS, 1)
    if sizes[mesh_lib.MODEL_AXIS] == 1 and pipe == 1:
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), tree)

    def one(path, leaf):
        pathstr = jax.tree_util.keystr(path)
        shape = getattr(leaf, 'shape', ())
        spec = P()
        if sizes[mesh_lib.MODEL_AXIS] > 1:
            spec = mesh_lib.param_spec(pathstr,
                                       ndim=getattr(leaf, 'ndim', None))
            for dim, axis in enumerate(spec):
                if axis is not None and (dim >= len(shape)
                                         or shape[dim] % sizes[axis]):
                    spec = P()
                    break
        if (pipe > 1 and "['EncoderBlock']" in pathstr
                and len(shape) >= 1 and shape[0] % pipe == 0):
            spec = P(mesh_lib.PIPE_AXIS, *spec[1:])
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, tree)


def shard_state(mesh: Mesh, state: TrainState) -> TrainState:
    """Places a TrainState on the mesh per the sharding rules."""
    return jax.device_put(state, _tree_shardings(mesh, state))


def shard_batch(mesh: Mesh, batch):
    """Shards every batch leaf over the data axis."""
    return jax.device_put(
        batch, jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P(mesh_lib.DATA_AXIS)), batch))


def make_train_step(model, tx, mesh: Mesh, state: TrainState,
                    num_classes: int = 1000, label_smoothing: float = 0.0,
                    donate: bool = True, remat: bool = False,
                    ema_decay=None, grad_accum: int = 1):
    """Builds the jitted train step with explicit in/out shardings."""
    step = functools.partial(train_step, model=model, tx=tx,
                             num_classes=num_classes,
                             label_smoothing=label_smoothing,
                             remat=remat, ema_decay=ema_decay,
                             grad_accum=grad_accum)
    state_sh = _tree_shardings(mesh, state)
    batch_sh = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(state_sh, batch_sh, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, mesh: Mesh, state: TrainState,
                   num_classes: int = 1000, use_ema: bool = False):
    step = functools.partial(eval_step, model=model, num_classes=num_classes,
                             use_ema=use_ema)
    state_sh = _tree_shardings(mesh, state)
    batch_sh = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    repl = NamedSharding(mesh, P())
    return jax.jit(step, in_shardings=(state_sh, batch_sh),
                   out_shardings=repl)


def stack_batches(batches):
    """Stacks a list of batch dicts along a new leading (step) axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)


def make_chained_train_step_over_batches(model, tx, mesh: Mesh,
                                         state: TrainState,
                                         num_classes: int = 1000,
                                         label_smoothing: float = 0.0,
                                         remat: bool = False,
                                         ema_decay=None,
                                         donate: bool = True,
                                         pipeline_microbatches=None,
                                         grad_accum: int = 1):
    """N train steps per dispatch over HOST-provided batches.

    Complements :func:`make_chained_train_step` (device-generated batches):
    here the caller stacks N real data batches (``stack_batches``) and the
    whole chunk runs as one ``lax.scan`` dispatch — the ~30 ms tunnel/
    dispatch RTT is paid once per N steps instead of per step, while the
    host loader (Grain) prepares the next chunk concurrently.

    Returns a jitted ``fn(state, rng, stacked_batches) -> (state,
    last_metrics)`` where every ``stacked_batches`` leaf has leading shape
    ``[N, batch, ...]`` sharded over the data axis on dim 1.

    With ``pipeline_microbatches`` set (and a ``pipe`` mesh axis), each
    scanned step runs GPipe-pipelined — chained dispatch and pipeline
    parallelism compose.
    """
    if pipeline_microbatches is not None:
        step = functools.partial(pipeline_train_step, model=model, tx=tx,
                                 mesh=mesh, num_classes=num_classes,
                                 label_smoothing=label_smoothing,
                                 num_microbatches=pipeline_microbatches,
                                 ema_decay=ema_decay)
    else:
        step = functools.partial(train_step, model=model, tx=tx,
                                 num_classes=num_classes,
                                 label_smoothing=label_smoothing,
                                 remat=remat, ema_decay=ema_decay,
                                 grad_accum=grad_accum)

    def chained(state, rng, batches):
        def body(carry, batch):
            new_state, metrics = step(carry, batch, rng)
            return new_state, metrics
        state, metrics = jax.lax.scan(body, state, batches)
        return state, jax.tree_util.tree_map(lambda m: m[-1], metrics)

    state_sh = _tree_shardings(mesh, state)
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(None, mesh_lib.DATA_AXIS))
    return jax.jit(chained,
                   in_shardings=(state_sh, repl, batch_sh),
                   out_shardings=(state_sh, repl),
                   donate_argnums=(0,) if donate else ())


def pipeline_train_step(state: TrainState, batch: Dict[str, jax.Array],
                        rng: jax.Array, *, model, tx, mesh: Mesh,
                        num_classes: int, label_smoothing: float,
                        num_microbatches: int, ema_decay=None):
    """One optimizer step with the encoder GPipe-pipelined (traceable body
    shared by the jitted and host-chained builders)."""
    from sav_tpu.parallel.pipeline import vit_pipeline_forward

    del rng  # pipeline path is dropout-free; nothing to fold in

    def loss_fn(params):
        images = batch['images'].astype(model.dtype)
        logits = vit_pipeline_forward(
            model, params, images, mesh=mesh,
            num_microbatches=num_microbatches, is_training=True)
        logits = logits.astype(jnp.float32)
        targets = blended_targets(batch, num_classes, label_smoothing)
        return jnp.mean(
            optax.softmax_cross_entropy(logits, targets)), logits

    (loss, logits), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    metrics = {'loss': loss}
    acc = topk_correct(logits, batch['labels'], prefix='train_')
    metrics.update(jax.tree_util.tree_map(jnp.mean, acc))
    new_state = state.apply_gradients(tx, grads, None, ema_decay=ema_decay)
    return new_state, metrics


def make_pipeline_train_step(model, tx, mesh: Mesh, state: TrainState,
                             num_classes: int = 1000,
                             label_smoothing: float = 0.0,
                             num_microbatches: int = 4,
                             ema_decay=None, donate: bool = True):
    """Train step with the encoder GPipe-pipelined over the ``pipe`` axis.

    Same loss/optimizer math as :func:`train_step` (equality-tested against
    the data-parallel step on the CPU mesh); the forward runs
    ``parallel.pipeline.vit_pipeline_forward``, so stage params (and their
    optimizer moments, via the same path rules) live only on their stage's
    devices. The reference had no pipeline story at all (pmap-only,
    reference train.py:94-96).
    """
    step = functools.partial(pipeline_train_step, model=model, tx=tx,
                             mesh=mesh, num_classes=num_classes,
                             label_smoothing=label_smoothing,
                             num_microbatches=num_microbatches,
                             ema_decay=ema_decay)
    state_sh = _tree_shardings(mesh, state)
    batch_sh = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    repl = NamedSharding(mesh, P())
    return jax.jit(step,
                   in_shardings=(state_sh, batch_sh, repl),
                   out_shardings=(state_sh, repl),
                   donate_argnums=(0,) if donate else ())


def make_pipeline_eval_step(model, mesh: Mesh, state: TrainState,
                            num_classes: int = 1000,
                            num_microbatches: int = 4,
                            use_ema: bool = False):
    """Mask-aware eval step running the pipelined forward."""
    from sav_tpu.parallel.pipeline import vit_pipeline_forward

    def step(state, batch):
        params = state.params
        if use_ema and state.ema_params is not None:
            params = state.ema_params
        images = batch['images'].astype(model.dtype)
        logits = vit_pipeline_forward(
            model, params, images, mesh=mesh,
            num_microbatches=num_microbatches, is_training=False)
        logits = logits.astype(jnp.float32)
        y = jax.nn.one_hot(batch['labels'], num_classes)
        per_example = optax.softmax_cross_entropy(logits, y)
        mask = batch.get('mask')
        if mask is None:
            mask = jnp.ones(per_example.shape[0], jnp.float32)
        acc = topk_correct(logits, batch['labels'], mask=mask,
                           prefix='eval_')
        sums = {'eval_loss': jnp.sum(per_example * mask),
                'eval_count': jnp.sum(mask)}
        sums.update({k: jnp.sum(v) for k, v in acc.items()})
        return sums

    state_sh = _tree_shardings(mesh, state)
    batch_sh = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    repl = NamedSharding(mesh, P())
    return jax.jit(step, in_shardings=(state_sh, batch_sh),
                   out_shardings=repl)


def make_chained_train_step(model, tx, mesh: Mesh, state: TrainState,
                            batch_fn, steps_per_call: int,
                            num_classes: int = 1000,
                            label_smoothing: float = 0.0,
                            remat: bool = False, donate: bool = True,
                            ema_decay=None, pipeline_microbatches=None,
                            grad_accum: int = 1):
    """N train steps per dispatch, batches generated on device.

    ``batch_fn(step_index)`` must be traceable (e.g.
    ``SyntheticDataset.device_batch_fn()``): the whole loop then runs as one
    ``lax.scan`` on the accelerator with zero host round trips between
    steps — on tunneled/async backends each dispatch costs ~30 ms, so
    per-step host loops leave throughput on the table.

    Returns a jitted ``fn(state, rng) -> (state, last_metrics)``.
    With ``pipeline_microbatches`` set each scanned step runs
    GPipe-pipelined over the mesh's ``pipe`` axis.
    """
    if pipeline_microbatches is not None:
        step = functools.partial(pipeline_train_step, model=model, tx=tx,
                                 mesh=mesh, num_classes=num_classes,
                                 label_smoothing=label_smoothing,
                                 num_microbatches=pipeline_microbatches,
                                 ema_decay=ema_decay)
    else:
        step = functools.partial(train_step, model=model, tx=tx,
                                 num_classes=num_classes,
                                 label_smoothing=label_smoothing,
                                 remat=remat, ema_decay=ema_decay,
                                 grad_accum=grad_accum)

    def chained(state, rng):
        def body(carry, _):
            batch = batch_fn(carry.step)
            new_state, metrics = step(carry, batch, rng)
            return new_state, metrics
        state, metrics = jax.lax.scan(body, state, None,
                                      length=steps_per_call)
        last = jax.tree_util.tree_map(lambda m: m[-1], metrics)
        return state, last

    state_sh = _tree_shardings(mesh, state)
    repl = NamedSharding(mesh, P())
    return jax.jit(chained,
                   in_shardings=(state_sh, repl),
                   out_shardings=(state_sh, repl),
                   donate_argnums=(0,) if donate else ())
