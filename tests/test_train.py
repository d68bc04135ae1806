"""Trainer tier: sharded train step on the 8-device CPU mesh, optimizer
semantics, determinism, eval masking, checkpoint save/restore."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sav_tpu.data.synthetic import SyntheticDataset
from sav_tpu.models import create_model
from sav_tpu.parallel.mesh import create_mesh
from sav_tpu.train import steps as steps_lib
from sav_tpu.train.state import (TrainState, build_optimizer,
                                 warmup_cosine_schedule)

NUM_CLASSES = 8
IMG = 32


def tiny_setup(model_parallelism=1, model_name=None, dtype=jnp.float32):
    mesh = create_mesh(model_parallelism=model_parallelism)
    if model_name:
        model = create_model(model_name, num_classes=NUM_CLASSES, dtype=dtype)
    else:
        from sav_tpu.models import ViT
        model = ViT(num_classes=NUM_CLASSES, num_layers=2, num_heads=4,
                    embed_dim=64, patch_shape=(16, 16), dtype=dtype)
    tx = build_optimizer(1e-3, weight_decay=1e-4, clip_grad=1.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, IMG, IMG, 3)), is_training=False)
    state = TrainState.create(variables, tx)
    state = steps_lib.shard_state(mesh, state)
    return mesh, model, tx, state


def test_train_step_runs_and_descends():
    mesh, model, tx, state = tiny_setup()
    data = SyntheticDataset(16, IMG, num_classes=NUM_CLASSES, mesh=mesh)
    step_fn = steps_lib.make_train_step(model, tx, mesh, state,
                                        num_classes=NUM_CLASSES,
                                        label_smoothing=0.1)
    rng = jax.random.PRNGKey(0)
    batch = data.batch(0)
    losses = []
    for _ in range(10):
        state, metrics = step_fn(state, batch, rng)
        losses.append(float(metrics['loss']))
    assert int(jax.device_get(state.step)) == 10
    # same batch repeatedly -> loss must drop (descent, not ascent: the
    # reference's schedule sign bug would fail this)
    assert losses[-1] < losses[0]


def test_train_step_deterministic():
    mesh, model, tx, state = tiny_setup()
    data = SyntheticDataset(16, IMG, num_classes=NUM_CLASSES, mesh=mesh)
    step_fn = steps_lib.make_train_step(model, tx, mesh, state,
                                        num_classes=NUM_CLASSES)
    rng = jax.random.PRNGKey(0)

    def run():
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.ones((1, IMG, IMG, 3)),
                               is_training=False)
        s = steps_lib.shard_state(mesh, TrainState.create(variables, tx))
        out = []
        for i in range(3):
            s, m = step_fn(s, data.batch(i), rng)
            out.append(float(m['loss']))
        return out

    assert run() == run()


def test_tensor_parallel_matches_data_parallel():
    """Same math under (8,1) and (4,2) meshes — GSPMD TP correctness."""
    losses = {}
    for mp in (1, 2):
        mesh, model, tx, state = tiny_setup(model_parallelism=mp)
        data = SyntheticDataset(8, IMG, num_classes=NUM_CLASSES, mesh=mesh)
        step_fn = steps_lib.make_train_step(model, tx, mesh, state,
                                            num_classes=NUM_CLASSES)
        rng = jax.random.PRNGKey(0)
        ls = []
        for i in range(3):
            state, m = step_fn(state, data.batch(i), rng)
            ls.append(float(m['loss']))
        losses[mp] = ls
    np.testing.assert_allclose(losses[1], losses[2], rtol=2e-3)


def test_mixup_batch_schema():
    mesh, model, tx, state = tiny_setup()
    step_fn = steps_lib.make_train_step(model, tx, mesh, state,
                                        num_classes=NUM_CLASSES,
                                        label_smoothing=0.1)
    batch = {
        'images': jnp.ones((16, IMG, IMG, 3)),
        'labels': jnp.zeros((16,), jnp.int32),
        'mix_labels': jnp.ones((16,), jnp.int32),
        'ratio': jnp.full((16,), 0.7),
    }
    batch = steps_lib.shard_batch(mesh, batch)
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics['loss']))


def test_eval_step_mask():
    mesh, model, tx, state = tiny_setup()
    eval_fn = steps_lib.make_eval_step(model, mesh, state,
                                       num_classes=NUM_CLASSES)
    batch = {
        'images': jnp.ones((16, IMG, IMG, 3)),
        'labels': jnp.zeros((16,), jnp.int32),
        'mask': jnp.concatenate([jnp.ones(8), jnp.zeros(8)]),
    }
    batch = steps_lib.shard_batch(mesh, batch)
    sums = jax.device_get(eval_fn(state, batch))
    assert float(sums['eval_count']) == 8.0


def test_optimizer_sign_and_decay():
    """Positive loss gradient must reduce the parameter (descent)."""
    tx = build_optimizer(0.1, weight_decay=0.0)
    params = {'w': jnp.ones(())}
    opt_state = tx.init(params)
    grads = {'w': jnp.ones(())}
    import optax
    updates, _ = tx.update(grads, opt_state, params)
    assert float(optax.apply_updates(params, updates)['w']) < 1.0


def test_warmup_cosine_schedule_shape():
    sched = warmup_cosine_schedule(5e-4, batch_size=512, steps_per_epoch=100)
    assert float(sched(0)) == 0.0
    peak = float(sched(500))  # end of 5-epoch warmup
    assert peak == pytest.approx(5e-4, rel=1e-3)
    assert float(sched(3000)) < peak  # decayed


def test_checkpoint_roundtrip(tmp_path):
    from sav_tpu.train.checkpoint import CheckpointManager
    mesh, model, tx, state = tiny_setup()
    data = SyntheticDataset(8, IMG, num_classes=NUM_CLASSES, mesh=mesh)
    step_fn = steps_lib.make_train_step(model, tx, mesh, state,
                                        num_classes=NUM_CLASSES)
    state, _ = step_fn(state, data.batch(0), jax.random.PRNGKey(0))

    mgr = CheckpointManager(os.fspath(tmp_path / 'ckpt'))
    mgr.save(1, state)
    mgr.wait()
    assert mgr.latest_step() == 1

    variables = model.init(jax.random.PRNGKey(7),
                           jnp.ones((1, IMG, IMG, 3)), is_training=False)
    fresh = steps_lib.shard_state(mesh, TrainState.create(variables, tx))
    restored = mgr.restore(fresh)
    mgr.close()

    assert int(jax.device_get(restored.step)) == 1
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_botnet_train_step_updates_everything():
    """BoTNet training: BN stats mutate, rel-pos embeddings get gradients —
    the reference could never run this at all (its forward crashed)."""
    mesh, model, tx, state = tiny_setup(model_name=None)
    from sav_tpu.models import BoTNet
    model = BoTNet(num_classes=NUM_CLASSES, stage_sizes=(1, 1, 1, 1))
    tx2 = build_optimizer(1e-2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, IMG, IMG, 3)), is_training=False)
    state = steps_lib.shard_state(mesh, TrainState.create(variables, tx2))
    step_fn = steps_lib.make_train_step(model, tx2, mesh, state,
                                        num_classes=NUM_CLASSES)
    data = SyntheticDataset(8, IMG, num_classes=NUM_CLASSES, mesh=mesh)
    # snapshot before stepping: the jitted step donates the input state
    old_bs = jax.tree_util.tree_leaves(jax.device_get(state.batch_stats))
    old_p = jax.device_get(state.params)
    new_state, metrics = step_fn(state, data.batch(0), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics['loss']))

    def leaf(tree, *path):
        for p in path:
            tree = tree[p]
        return np.asarray(tree)

    # batch stats changed
    new_bs = jax.tree_util.tree_leaves(jax.device_get(new_state.batch_stats))
    assert any(not np.array_equal(a, b) for a, b in zip(old_bs, new_bs))
    # relative-position embeddings received gradient
    new_p = jax.device_get(new_state.params)
    rel_old = leaf(old_p, 'BoTBlock_0', 'BoTMHSA_0', 'RelativeLogits_0',
                   'rel_pos_emb_w')
    rel_new = leaf(new_p, 'BoTBlock_0', 'BoTMHSA_0', 'RelativeLogits_0',
                   'rel_pos_emb_w')
    assert not np.array_equal(rel_old, rel_new)


def test_trainer_end_to_end_tiny():
    """Loop-level: Trainer runs, logs, and reports finite metrics."""
    from sav_tpu.train import TrainConfig, Trainer
    config = TrainConfig(model_name='vit_ti_patch16', img_size=32,
                         batch_size=8, total_steps=2, dtype='float32',
                         num_classes=NUM_CLASSES, label_smoothing=0.1,
                         log_every=1, eval_every_epochs=10**6,
                         checkpoint_every_epochs=10**6, eval_batches=1)
    metrics = Trainer(config).run()
    assert np.isfinite(metrics['loss'])
    assert metrics['loss'] > 0


def test_chained_train_steps_match_python_loop():
    from sav_tpu.data.synthetic import device_batch_fn
    mesh, model, tx, state = tiny_setup()
    rng = jax.random.PRNGKey(0)
    batch_fn = device_batch_fn(8, IMG, NUM_CLASSES, seed=5)

    # python loop
    step_fn = steps_lib.make_train_step(model, tx, mesh, state,
                                        num_classes=NUM_CLASSES,
                                        donate=False)
    s = state
    for i in range(4):
        batch = jax.jit(batch_fn)(jnp.asarray(i))
        batch = steps_lib.shard_batch(mesh, batch)
        s, metrics = step_fn(s, batch, rng)
    loop_loss = float(metrics['loss'])

    # one chained dispatch
    chained = steps_lib.make_chained_train_step(
        model, tx, mesh, state, batch_fn, steps_per_call=4,
        num_classes=NUM_CLASSES, donate=False)
    s2, metrics2 = chained(state, rng)
    assert int(jax.device_get(s2.step)) == 4
    np.testing.assert_allclose(float(metrics2['loss']), loop_loss,
                               rtol=1e-5)


def test_trainer_chained_dispatch():
    from sav_tpu.train import TrainConfig, Trainer
    config = TrainConfig(model_name='vit_ti_patch16', img_size=32,
                         batch_size=8, total_steps=4, dtype='float32',
                         num_classes=NUM_CLASSES, steps_per_dispatch=2,
                         log_every=1, eval_every_epochs=10**6,
                         checkpoint_every_epochs=10**6, eval_batches=1)
    metrics = Trainer(config).run()
    assert np.isfinite(metrics['loss'])


def test_scanned_tensor_parallel_matches_data_parallel():
    """scan_layers + TP: stacked kernels shard the intended axis and the
    math matches pure data parallel."""
    from sav_tpu.models import ViT
    losses = {}
    for mp in (1, 2):
        mesh = create_mesh(model_parallelism=mp)
        model = ViT(num_classes=NUM_CLASSES, num_layers=2, num_heads=4,
                    embed_dim=64, patch_shape=(16, 16), scan_layers=True)
        tx = build_optimizer(1e-3)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.ones((1, IMG, IMG, 3)),
                               is_training=False)
        state = steps_lib.shard_state(mesh, TrainState.create(variables, tx))
        if mp == 2:
            kernel_sharding = state.params['Encoder_0']['EncoderBlock'][
                'SelfAttentionBlock_0']['queries']['kernel'].sharding
            # stacked (layers, in, heads, dim): heads axis sharded
            assert kernel_sharding.spec == jax.sharding.PartitionSpec(
                None, None, 'model', None)
        step_fn = steps_lib.make_train_step(model, tx, mesh, state,
                                            num_classes=NUM_CLASSES)
        data = SyntheticDataset(8, IMG, num_classes=NUM_CLASSES, mesh=mesh)
        ls = []
        for i in range(2):
            state, m = step_fn(state, data.batch(i), jax.random.PRNGKey(0))
            ls.append(float(m['loss']))
        losses[mp] = ls
    np.testing.assert_allclose(losses[1], losses[2], rtol=2e-3)


def test_dropout_and_stoch_depth_under_scan():
    """CaiT with active dropout + stochastic depth trains under nn.scan —
    the RNG-plumbing gap that broke the reference (SURVEY §3.4)."""
    from sav_tpu.models import CaiT
    mesh = create_mesh()
    model = CaiT(num_classes=NUM_CLASSES, num_layers=3,
                 num_layers_token_only=1, num_heads=4, embed_dim=64,
                 patch_shape=(16, 16), stoch_depth_rate=0.3,
                 layerscale_eps=1e-5, dropout_rate=0.1,
                 attn_dropout_rate=0.1, scan_layers=True)
    tx = build_optimizer(1e-3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, IMG, IMG, 3)), is_training=False)
    state = steps_lib.shard_state(mesh, TrainState.create(variables, tx))
    step_fn = steps_lib.make_train_step(model, tx, mesh, state,
                                        num_classes=NUM_CLASSES,
                                        donate=False)
    data = SyntheticDataset(8, IMG, num_classes=NUM_CLASSES, mesh=mesh)
    s1, m1 = step_fn(state, data.batch(0), jax.random.PRNGKey(0))
    s2, _ = step_fn(state, data.batch(0), jax.random.PRNGKey(0))
    s3, _ = step_fn(state, data.batch(0), jax.random.PRNGKey(7))
    assert np.isfinite(float(m1['loss']))

    def head_kernel(s):
        return np.asarray(jax.device_get(s.params['Dense_0']['kernel']))

    # same rng -> identical stochastic regularization -> identical update;
    # different rng -> different dropout/stoch-depth masks -> different grads
    np.testing.assert_array_equal(head_kernel(s1), head_kernel(s2))
    assert not np.array_equal(head_kernel(s1), head_kernel(s3))


def test_remat_policies_match_no_remat():
    """Every remat mode is a pure recompute schedule: identical numerics."""
    mesh, model, tx, state = tiny_setup()
    data = SyntheticDataset(8, IMG, num_classes=NUM_CLASSES, mesh=mesh)
    rng = jax.random.PRNGKey(0)
    batch = data.batch(0)

    def one_step(remat):
        step_fn = steps_lib.make_train_step(model, tx, mesh, state,
                                            num_classes=NUM_CLASSES,
                                            label_smoothing=0.1,
                                            donate=False, remat=remat)
        new_state, metrics = step_fn(state, batch, rng)
        return float(metrics['loss']), new_state.params

    ref_loss, ref_params = one_step(False)
    for remat in (True, 'full', 'dots', 'dots_no_batch'):
        loss, params = one_step(remat)
        assert loss == ref_loss, remat
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)), ref_params, params)


def test_mu_dtype_storage_and_descent():
    """mu_dtype=bfloat16 stores the first moment in bf16 and still trains."""
    mesh = create_mesh()
    from sav_tpu.models import ViT
    model = ViT(num_classes=NUM_CLASSES, num_layers=2, num_heads=4,
                embed_dim=64, patch_shape=(16, 16))
    tx = build_optimizer(1e-2, weight_decay=1e-4, mu_dtype='bfloat16')
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, IMG, IMG, 3)), is_training=False)
    state = TrainState.create(variables, tx)
    state = steps_lib.shard_state(mesh, state)

    mus = [l for l in jax.tree_util.tree_leaves(state.opt_state)
           if getattr(l, 'dtype', None) == jnp.bfloat16]
    assert mus, 'no bf16 moment leaves found'

    data = SyntheticDataset(16, IMG, num_classes=NUM_CLASSES, mesh=mesh)
    step_fn = steps_lib.make_train_step(model, tx, mesh, state,
                                        num_classes=NUM_CLASSES,
                                        label_smoothing=0.1)
    rng = jax.random.PRNGKey(0)
    batch = data.batch(0)
    losses = []
    for _ in range(10):
        state, metrics = step_fn(state, batch, rng)
        losses.append(float(metrics['loss']))
    assert losses[-1] < losses[0]


def test_ema_params_track_slowly_and_eval_uses_them():
    mesh = create_mesh()
    from sav_tpu.models import ViT
    model = ViT(num_classes=NUM_CLASSES, num_layers=2, num_heads=4,
                embed_dim=64, patch_shape=(16, 16))
    tx = build_optimizer(1e-2, weight_decay=0.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, IMG, IMG, 3)), is_training=False)
    state = TrainState.create(variables, tx, ema=True)
    state = steps_lib.shard_state(mesh, state)

    data = SyntheticDataset(16, IMG, num_classes=NUM_CLASSES, mesh=mesh)
    # donate=True is the regression case: an EMA tree aliasing the param
    # buffers would donate the same buffer twice and wedge the executor
    step_fn = steps_lib.make_train_step(model, tx, mesh, state,
                                        num_classes=NUM_CLASSES,
                                        ema_decay=0.9, donate=True)
    rng = jax.random.PRNGKey(0)
    batch = data.batch(0)
    init_params = jax.device_get(state.params)
    for _ in range(5):
        state, _ = step_fn(state, batch, rng)

    def dist(a, b):
        return sum(float(jnp.sum(jnp.abs(x - y))) for x, y in zip(
            jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))

    params, ema = jax.device_get((state.params, state.ema_params))

    # EMA lags the raw params: closer to the init than the live params are
    assert dist(ema, init_params) < dist(params, init_params)
    assert dist(ema, params) > 0

    eval_fn = steps_lib.make_eval_step(model, mesh, state,
                                       num_classes=NUM_CLASSES, use_ema=True)
    out = eval_fn(state, data.batch(1))
    assert float(out['eval_count']) == 16

    # without ema enabled, state carries no extra tree
    plain = TrainState.create(variables, tx)
    assert plain.ema_params is None


def test_warmup_stable_decay_schedule():
    from sav_tpu.train.state import warmup_stable_decay_schedule
    sched = warmup_stable_decay_schedule(1.0, total_steps=100,
                                         warmup_steps=10, decay_steps=20,
                                         end_value=0.1)
    assert float(sched(0)) == 0.0
    assert float(sched(10)) == pytest.approx(1.0)
    assert float(sched(50)) == pytest.approx(1.0)   # plateau
    assert float(sched(80)) == pytest.approx(1.0)   # plateau end
    assert float(sched(100)) == pytest.approx(0.1)  # decayed
    assert 0.1 < float(sched(90)) < 1.0


def test_checkpoint_roundtrip_with_ema(tmp_path):
    from sav_tpu.train.checkpoint import CheckpointManager
    mesh = create_mesh()
    from sav_tpu.models import ViT
    model = ViT(num_classes=NUM_CLASSES, num_layers=2, num_heads=4,
                embed_dim=64, patch_shape=(16, 16))
    tx = build_optimizer(1e-2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, IMG, IMG, 3)), is_training=False)
    state = steps_lib.shard_state(mesh,
                                  TrainState.create(variables, tx, ema=True))
    data = SyntheticDataset(8, IMG, num_classes=NUM_CLASSES, mesh=mesh)
    step_fn = steps_lib.make_train_step(model, tx, mesh, state,
                                        num_classes=NUM_CLASSES,
                                        ema_decay=0.9)
    state, _ = step_fn(state, data.batch(0), jax.random.PRNGKey(0))

    mgr = CheckpointManager(os.fspath(tmp_path / 'ckpt'))
    mgr.save(1, state)
    mgr.wait()
    fresh = steps_lib.shard_state(
        mesh, TrainState.create(
            model.init(jax.random.PRNGKey(7), jnp.ones((1, IMG, IMG, 3)),
                       is_training=False), tx, ema=True))
    restored = mgr.restore(fresh)
    mgr.close()
    for a, b in zip(jax.tree_util.tree_leaves(restored.ema_params),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_host_chained_steps_match_python_loop():
    """make_chained_train_step_over_batches == per-step loop on real batches,
    including an uneven tail chunk."""
    mesh, model, tx, state = tiny_setup()
    rng = jax.random.PRNGKey(0)
    data = SyntheticDataset(8, IMG, num_classes=NUM_CLASSES, mesh=mesh)
    batches = [data.batch(i) for i in range(5)]

    step_fn = steps_lib.make_train_step(model, tx, mesh, state,
                                        num_classes=NUM_CLASSES,
                                        donate=False)
    s = state
    for b in batches:
        s, metrics = step_fn(s, b, rng)
    loop_loss = float(metrics['loss'])

    chained = steps_lib.make_chained_train_step_over_batches(
        model, tx, mesh, state, num_classes=NUM_CLASSES, donate=False)
    s2, _ = chained(state, rng, steps_lib.stack_batches(batches[:3]))
    s2, metrics2 = chained(s2, rng, steps_lib.stack_batches(batches[3:]))
    assert int(jax.device_get(s2.step)) == 5
    np.testing.assert_allclose(float(metrics2['loss']), loop_loss, rtol=1e-5)

    for a, b in zip(jax.tree_util.tree_leaves(s.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_trainer_host_chained_dispatch_grain(tmp_path):
    """Trainer end-to-end: steps_per_dispatch>1 over a Grain npz-shard
    source (the host-loader path, not device-synthetic)."""
    from sav_tpu.data.grain_loader import write_npz_shards
    from sav_tpu.train import TrainConfig, Trainer

    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (32, IMG, IMG, 3), dtype=np.uint8)
    labels = rng.randint(0, NUM_CLASSES, size=32)
    shard_dir = os.fspath(tmp_path / 'shards')
    write_npz_shards(images, labels, shard_dir, shard_size=16)

    config = TrainConfig(model_name='vit_ti_patch16', img_size=IMG,
                         batch_size=8, total_steps=4, dtype='float32',
                         num_classes=NUM_CLASSES, steps_per_dispatch=3,
                         dataset=shard_dir, log_every=1,
                         eval_every_epochs=10**6,
                         checkpoint_every_epochs=10**6, eval_batches=1)
    metrics = Trainer(config).run()
    assert np.isfinite(metrics['loss'])


def test_trainer_resume_restores_state_and_data_position(tmp_path):
    """Run 2 steps with checkpointing, then resume to 4: the second Trainer
    must restore the TrainState AND seek the Grain loader (no replay)."""
    from sav_tpu.data.grain_loader import write_npz_shards
    from sav_tpu.train import TrainConfig, Trainer

    rng = np.random.RandomState(1)
    images = rng.randint(0, 256, (64, IMG, IMG, 3), dtype=np.uint8)
    labels = rng.randint(0, NUM_CLASSES, size=64)
    shard_dir = os.fspath(tmp_path / 'shards')
    write_npz_shards(images, labels, shard_dir, shard_size=32)
    ckpt_dir = os.fspath(tmp_path / 'ckpt')

    def config(total_steps):
        return TrainConfig(model_name='vit_ti_patch16', img_size=IMG,
                           batch_size=8, total_steps=total_steps,
                           dtype='float32', num_classes=NUM_CLASSES,
                           dataset=shard_dir, checkpoint_dir=ckpt_dir,
                           log_every=1, eval_every_epochs=10**6,
                           checkpoint_every_epochs=10**6, eval_batches=1)

    Trainer(config(2)).run()

    resumed = Trainer(config(4))
    assert int(jax.device_get(resumed.state.step)) == 2
    data_state = resumed.checkpoints.restore_data_state()
    assert data_state is not None
    import json
    assert json.loads(data_state.decode())['next_step'] == 2
    metrics = resumed.run()
    assert int(jax.device_get(resumed.state.step)) == 4
    assert np.isfinite(metrics['loss'])


def test_checkpoint_restores_legacy_layout(tmp_path):
    """Checkpoints written before the composite (state + data) format
    stored the TrainState as Orbax's default item; restore must fall back
    to that layout instead of failing resume (review finding)."""
    import orbax.checkpoint as ocp

    from sav_tpu.train.checkpoint import CheckpointManager

    mesh, model, tx, state = tiny_setup()
    directory = os.fspath(tmp_path / 'ckpt')

    legacy = ocp.CheckpointManager(
        directory, options=ocp.CheckpointManagerOptions(create=True))
    legacy.save(5, args=ocp.args.StandardSave(state))
    legacy.wait_until_finished()
    legacy.close()

    variables = model.init(jax.random.PRNGKey(7),
                           jnp.ones((1, IMG, IMG, 3)), is_training=False)
    fresh = steps_lib.shard_state(mesh, TrainState.create(variables, tx))
    mgr = CheckpointManager(directory)
    restored = mgr.restore(fresh)
    mgr.close()
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_prefetch_depth_is_loss_invariant(tmp_path):
    """The chained-host prefetch ring (prefetch_chunks>1) must not change
    the training stream: identical final loss at depth 1 and depth 3."""
    from sav_tpu.data.grain_loader import write_npz_shards
    from sav_tpu.train import TrainConfig, Trainer

    rng = np.random.RandomState(1)
    images = rng.randint(0, 256, (48, IMG, IMG, 3), dtype=np.uint8)
    labels = rng.randint(0, NUM_CLASSES, size=48)
    shard_dir = os.fspath(tmp_path / 'shards')
    write_npz_shards(images, labels, shard_dir, shard_size=16)

    def run(depth):
        config = TrainConfig(model_name='vit_ti_patch16', img_size=IMG,
                             batch_size=8, total_steps=6, dtype='float32',
                             num_classes=NUM_CLASSES, steps_per_dispatch=2,
                             prefetch_chunks=depth, dataset=shard_dir,
                             log_every=1, eval_every_epochs=10**6,
                             checkpoint_every_epochs=10**6, eval_batches=1)
        return Trainer(config).run()['loss']

    assert run(1) == run(3)


def test_grad_accum_matches_single_step():
    """grad_accum=4 must produce the same update as one full-batch step
    (equal microbatches => mean-of-means is the global mean; dropout-free
    config so RNG streams don't matter). SGD keeps the comparison linear
    in the gradients — Adam at step 0 is ~sign descent and amplifies
    summation-order noise on near-zero gradients to visible param diffs."""
    import optax
    mesh, model, _, _ = tiny_setup()
    tx = optax.sgd(1e-2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, IMG, IMG, 3)), is_training=False)
    state = steps_lib.shard_state(mesh, TrainState.create(variables, tx))
    data = SyntheticDataset(16, IMG, num_classes=NUM_CLASSES, mesh=mesh)
    batch = data.batch(0)
    rng = jax.random.PRNGKey(0)

    full = steps_lib.make_train_step(model, tx, mesh, state,
                                     num_classes=NUM_CLASSES,
                                     label_smoothing=0.1, donate=False)
    accum = steps_lib.make_train_step(model, tx, mesh, state,
                                      num_classes=NUM_CLASSES,
                                      label_smoothing=0.1, donate=False,
                                      grad_accum=4)
    s_full, m_full = full(state, batch, rng)
    s_acc, m_acc = accum(state, batch, rng)
    np.testing.assert_allclose(float(m_full['loss']),
                               float(m_acc['loss']), rtol=1e-5)
    np.testing.assert_allclose(float(m_full['train_top_1_acc']),
                               float(m_acc['train_top_1_acc']), atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_full.params),
                    jax.tree_util.tree_leaves(s_acc.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_grad_accum_batchnorm_stats_update():
    """BN models thread batch_stats through the microbatch scan."""
    mesh, model, tx, state = tiny_setup(model_name='cvt-13')
    data = SyntheticDataset(8, IMG, num_classes=NUM_CLASSES, mesh=mesh)
    step_fn = steps_lib.make_train_step(model, tx, mesh, state,
                                        num_classes=NUM_CLASSES,
                                        grad_accum=2, donate=False)
    before = jax.tree_util.tree_leaves(state.batch_stats)
    new_state, metrics = step_fn(state, data.batch(0), jax.random.PRNGKey(0))
    after = jax.tree_util.tree_leaves(new_state.batch_stats)
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))
    assert np.isfinite(float(metrics['loss']))


def test_grad_accum_rejects_indivisible_batch():
    mesh, model, tx, state = tiny_setup()
    batch = {'images': jnp.ones((10, IMG, IMG, 3)),
             'labels': jnp.zeros((10,), jnp.int32)}
    with pytest.raises(ValueError, match='not divisible'):
        steps_lib.train_step(state, batch, jax.random.PRNGKey(0),
                             model=model, tx=tx, num_classes=NUM_CLASSES,
                             label_smoothing=0.1, grad_accum=3)


def test_trainer_chained_eval_cadence(tmp_path):
    """r5 fix: the chained-host loop (steps_per_dispatch>1) must evaluate
    on the eval_every_epochs cadence like the per-step loop — before the
    fix it evaluated ONCE at the end, so long runs logged no accuracy
    curve (the round-4 soaks' logs have no mid-run eval lines)."""
    from sav_tpu.data.grain_loader import write_npz_shards
    from sav_tpu.train import TrainConfig, Trainer

    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (32, IMG, IMG, 3), dtype=np.uint8)
    labels = rng.randint(0, NUM_CLASSES, size=32)
    shard_dir = os.fspath(tmp_path / 'shards')
    write_npz_shards(images, labels, shard_dir, shard_size=16)

    config = TrainConfig(model_name='vit_ti_patch16', img_size=IMG,
                         batch_size=8, num_epochs=3, images_per_epoch=16,
                         dtype='float32', num_classes=NUM_CLASSES,
                         steps_per_dispatch=2, dataset=shard_dir,
                         log_every=1, eval_every_epochs=1,
                         checkpoint_every_epochs=10**6, eval_batches=1)
    trainer = Trainer(config)
    eval_steps = []
    orig_log = trainer.logger.log

    def spy(metrics, step):
        if any(k.startswith('eval_') for k in metrics):
            eval_steps.append(step)
        orig_log(metrics, step)

    trainer.logger.log = spy
    metrics = trainer.run()
    # 2 steps/epoch x 3 epochs: mid-run evals after epochs 1 and 2
    # (steps 2, 4) plus the final eval at step 6
    assert eval_steps == [2, 4, 6], eval_steps
    assert np.isfinite(metrics['eval_loss'])
