"""Pipeline parallelism (GPipe over the ``pipe`` mesh axis): forward and
gradient equality with the unpipelined model, and full train-step loss/param
equality with the data-parallel step on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from sav_tpu.models import ViT
from sav_tpu.parallel import pipeline as pp
from sav_tpu.parallel.mesh import create_mesh
from sav_tpu.train import steps as steps_lib
from sav_tpu.train.state import TrainState, build_optimizer

NUM_CLASSES = 8
IMG = 16


def tiny_vit(**kw):
    return ViT(num_classes=NUM_CLASSES, num_layers=4, num_heads=2,
               embed_dim=16, patch_shape=(4, 4), scan_layers=True, **kw)


def init_state(model, tx):
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, IMG, IMG, 3)), is_training=False)
    return TrainState.create(variables, tx)


def batch_of(n, seed=0):
    rng = np.random.RandomState(seed)
    return {'images': jnp.asarray(rng.rand(n, IMG, IMG, 3), jnp.float32),
            'labels': jnp.asarray(rng.randint(0, NUM_CLASSES, n))}


def test_mesh_pipe_axis():
    mesh = create_mesh(pipeline_parallelism=4)
    assert dict(mesh.shape) == {'data': 2, 'pipe': 4, 'model': 1}
    mesh = create_mesh(pipeline_parallelism=2, model_parallelism=2)
    assert dict(mesh.shape) == {'data': 2, 'pipe': 2, 'model': 2}
    with pytest.raises(ValueError):
        create_mesh(pipeline_parallelism=3)


@pytest.mark.parametrize('num_microbatches', [1, 2, 4])
def test_pipeline_forward_matches_apply(num_microbatches):
    mesh = create_mesh(pipeline_parallelism=4)
    model = tiny_vit()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, IMG, IMG, 3)), is_training=False)
    batch = batch_of(8)

    expected = model.apply(variables, batch['images'], is_training=False)
    got = jax.jit(lambda p, x: pp.vit_pipeline_forward(
        model, p, x, mesh=mesh, num_microbatches=num_microbatches))(
            variables['params'], batch['images'])
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_grads_match():
    mesh = create_mesh(pipeline_parallelism=2)
    model = tiny_vit()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, IMG, IMG, 3)), is_training=False)
    batch = batch_of(16)  # microbatch (16/4=4) must divide the data axis (4)
    y = jax.nn.one_hot(batch['labels'], NUM_CLASSES)

    def loss_ref(params):
        logits = model.apply({'params': params}, batch['images'],
                             is_training=True)
        return jnp.mean(optax.softmax_cross_entropy(logits, y))

    def loss_pp(params):
        logits = pp.vit_pipeline_forward(model, params, batch['images'],
                                         mesh=mesh, num_microbatches=4,
                                         is_training=True)
        return jnp.mean(optax.softmax_cross_entropy(logits, y))

    g_ref = jax.grad(loss_ref)(variables['params'])
    g_pp = jax.jit(jax.grad(loss_pp))(variables['params'])
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = {jax.tree_util.keystr(p): v
               for p, v in jax.tree_util.tree_leaves_with_path(g_pp)}
    for path, ref in flat_ref:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(flat_pp[key]),
                                   np.asarray(ref), rtol=1e-4, atol=1e-5,
                                   err_msg=key)


def test_pipeline_train_step_matches_data_parallel():
    model = tiny_vit()
    tx = build_optimizer(1e-3, weight_decay=1e-4, clip_grad=1.0)
    batch = batch_of(8)
    rng = jax.random.PRNGKey(0)

    dp_mesh = create_mesh()
    dp_state = steps_lib.shard_state(dp_mesh, init_state(model, tx))
    dp_step = steps_lib.make_train_step(model, tx, dp_mesh, dp_state,
                                        num_classes=NUM_CLASSES,
                                        label_smoothing=0.1)

    pp_mesh = create_mesh(pipeline_parallelism=4)
    pp_state = steps_lib.shard_state(pp_mesh, init_state(model, tx))
    pp_step = steps_lib.make_pipeline_train_step(
        model, tx, pp_mesh, pp_state, num_classes=NUM_CLASSES,
        label_smoothing=0.1, num_microbatches=2)

    for i in range(3):
        dp_state, dp_m = dp_step(dp_state, batch, rng)
        pp_state, pp_m = pp_step(pp_state, batch, rng)
        np.testing.assert_allclose(float(pp_m['loss']),
                                   float(dp_m['loss']), rtol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(dp_state.params),
            jax.tree_util.tree_leaves_with_path(pp_state.params)):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        # grads are exact (test_pipeline_grads_match); here Adam's
        # 1/sqrt(nu) amplifies reduction-order noise in near-zero-grad
        # coords over 3 steps, so only an absolute band is meaningful
        # (3 steps x lr 1e-3 = 3e-3 cumulative update scale)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4,
                                   err_msg=jax.tree_util.keystr(pa))


def test_pipeline_stage_params_actually_sharded():
    """The stacked layer axis must live on the pipe axis (stage shards),
    not replicated — otherwise it's not pipeline parallelism."""
    model = tiny_vit()
    tx = build_optimizer(1e-3)
    pp_mesh = create_mesh(pipeline_parallelism=4)
    state = steps_lib.shard_state(pp_mesh, init_state(model, tx))
    kernel = state.params['Encoder_0']['EncoderBlock'][
        'FFBlock_0']['Dense_0']['kernel']
    spec = kernel.sharding.spec
    assert spec[0] == 'pipe', spec
    # non-stacked params stay replicated
    head = state.params['Dense_0']['kernel']
    assert all(axis is None for axis in head.sharding.spec), \
        head.sharding.spec


def test_pipeline_eval_step_runs():
    model = tiny_vit()
    tx = build_optimizer(1e-3)
    pp_mesh = create_mesh(pipeline_parallelism=2)
    state = steps_lib.shard_state(pp_mesh, init_state(model, tx))
    eval_fn = steps_lib.make_pipeline_eval_step(
        model, pp_mesh, state, num_classes=NUM_CLASSES, num_microbatches=2)
    batch = batch_of(8)
    batch['mask'] = jnp.ones(8, jnp.float32)
    sums = eval_fn(state, batch)
    assert float(sums['eval_count']) == 8.0
    assert np.isfinite(float(sums['eval_loss']))


def test_trainer_pipeline_end_to_end():
    """Loop-level: the --pipeline_parallelism path trains and evaluates."""
    from sav_tpu.train import TrainConfig, Trainer
    config = TrainConfig(model_name='vit_ti_patch16', img_size=32,
                         batch_size=8, total_steps=2, dtype='float32',
                         num_classes=NUM_CLASSES, label_smoothing=0.1,
                         scan_layers=True, pipeline_parallelism=4,
                         pipeline_microbatches=2, log_every=1,
                         eval_every_epochs=10**6,
                         checkpoint_every_epochs=10**6, eval_batches=1)
    metrics = Trainer(config).run()
    assert np.isfinite(metrics['loss'])
    assert metrics['loss'] > 0


def test_chained_pipeline_matches_python_loop():
    """steps_per_dispatch x pipeline_parallelism compose: one scanned
    dispatch of pipelined steps equals the per-step python loop."""
    model = tiny_vit()
    tx = build_optimizer(1e-3)
    mesh = create_mesh(pipeline_parallelism=4)
    state = steps_lib.shard_state(mesh, init_state(model, tx))
    rng = jax.random.PRNGKey(0)
    batches = [batch_of(8, seed=i) for i in range(3)]

    step_fn = steps_lib.make_pipeline_train_step(
        model, tx, mesh, state, num_classes=NUM_CLASSES,
        num_microbatches=2, donate=False)
    s = state
    for b in batches:
        s, metrics = step_fn(s, b, rng)
    loop_loss = float(metrics['loss'])

    chained = steps_lib.make_chained_train_step_over_batches(
        model, tx, mesh, state, num_classes=NUM_CLASSES, donate=False,
        pipeline_microbatches=2)
    s2, metrics2 = chained(state, rng, steps_lib.stack_batches(batches))
    assert int(jax.device_get(s2.step)) == 3
    np.testing.assert_allclose(float(metrics2['loss']), loop_loss,
                               rtol=1e-5)


def test_trainer_pipeline_chained_dispatch():
    """Loop-level: pipeline parallelism + chained device dispatch."""
    from sav_tpu.train import TrainConfig, Trainer
    config = TrainConfig(model_name='vit_ti_patch16', img_size=32,
                         batch_size=8, total_steps=4, dtype='float32',
                         num_classes=NUM_CLASSES, scan_layers=True,
                         pipeline_parallelism=4, pipeline_microbatches=2,
                         steps_per_dispatch=2, log_every=1,
                         eval_every_epochs=10**6,
                         checkpoint_every_epochs=10**6, eval_batches=1)
    metrics = Trainer(config).run()
    assert np.isfinite(metrics['loss'])


def test_trainer_pipeline_requires_scan_layers():
    from sav_tpu.train import TrainConfig, Trainer
    config = TrainConfig(model_name='vit_ti_patch16', img_size=32,
                         batch_size=8, total_steps=1, dtype='float32',
                         num_classes=NUM_CLASSES, pipeline_parallelism=4)
    with pytest.raises(ValueError, match='scan_layers'):
        Trainer(config)


def test_pipeline_requires_scan_layers():
    model = ViT(num_classes=NUM_CLASSES, num_layers=2, num_heads=2,
                embed_dim=16, patch_shape=(4, 4), scan_layers=False)
    mesh = create_mesh(pipeline_parallelism=2)
    with pytest.raises(ValueError, match='scan_layers'):
        pp.vit_pipeline_forward(model, {}, jnp.ones((4, IMG, IMG, 3)),
                                mesh=mesh, num_microbatches=2)
