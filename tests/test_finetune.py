"""Fine-tune tier: pos-embed interpolation, head re-init, and the
--finetune_from Trainer path (pretrain@32 -> finetune@64 resolution
transfer with a new label count).

The reference trainer has no fine-tune or even restore path (it only
ever saves — reference train.py:123-127); resolution transfer via
pos-embed interpolation is the workflow its @384 model configs assume.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sav_tpu.train.finetune import (adapt_restored_for_inference,
                                    adapt_tree, interpolate_pos_embed,
                                    interpolate_rel_pos_embed)


def test_interpolate_identity_and_prefix_detection():
    rng = np.random.RandomState(0)
    # ViT layout: cls-prefixed, 2x2 grid -> 4x4 grid
    src = jnp.asarray(rng.randn(1, 5, 16).astype(np.float32))
    out = interpolate_pos_embed(src, 17)
    assert out.shape == (1, 17, 16)
    np.testing.assert_array_equal(out[:, 0], src[:, 0])  # cls kept verbatim
    # same length is a no-op (identity object, no numeric drift)
    assert interpolate_pos_embed(src, 5) is src
    # CaiT layout: no prefix, 4x4 -> 6x6
    src0 = jnp.asarray(rng.randn(1, 16, 8).astype(np.float32))
    assert interpolate_pos_embed(src0, 36).shape == (1, 36, 8)
    with pytest.raises(ValueError, match='square token grids'):
        interpolate_pos_embed(src, 7)   # 7 and 6 both non-square


def test_interpolate_reproduces_linear_field():
    """Bilinear resize must be exact on an affine function of (row, col)."""
    g = 4
    rows, cols = np.meshgrid(np.arange(g), np.arange(g), indexing='ij')
    field = (2.0 * rows + 3.0 * cols)[None, :, :, None]  # [1, g, g, 1]
    src = jnp.asarray(field.reshape(1, g * g, 1).astype(np.float32))
    out = np.asarray(interpolate_pos_embed(src, 64))     # 4x4 -> 8x8
    out_grid = out.reshape(8, 8)
    # values stay within the source range and keep the field's ordering
    assert out_grid.min() >= field.min() - 1e-5
    assert out_grid.max() <= field.max() + 1e-5
    assert np.all(np.diff(out_grid, axis=0) >= -1e-5)
    assert np.all(np.diff(out_grid, axis=1) >= -1e-5)
    # half-pixel bilinear is affine away from the clamped border: interior
    # second differences vanish
    d2r = np.diff(out_grid[1:-1, 1:-1], n=2, axis=0)
    d2c = np.diff(out_grid[1:-1, 1:-1], n=2, axis=1)
    np.testing.assert_allclose(d2r, 0.0, atol=1e-4)
    np.testing.assert_allclose(d2c, 0.0, atol=1e-4)


def test_interpolate_rel_pos_table():
    table = jnp.asarray(np.linspace(0, 1, 7)[:, None].astype(np.float32)
                        * np.ones((1, 4), np.float32))
    out = np.asarray(interpolate_rel_pos_embed(table, 13))
    assert out.shape == (13, 4)
    # linear resample of a ramp stays monotone within the source range,
    # and is still a ramp away from the clamped border
    assert np.all(np.diff(out[:, 0]) >= -1e-6)
    assert out[:, 0].min() >= -1e-6 and out[:, 0].max() <= 1 + 1e-6
    interior = np.diff(out[2:-2, 0])
    np.testing.assert_allclose(interior, interior[0], atol=1e-5)


def _vit_params(img, num_classes, model_name='vit_ti_patch16'):
    from sav_tpu.models import create_model
    model = create_model(model_name, num_classes=num_classes,
                         dtype=jnp.float32)
    variables = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(0), jnp.ones((1, img, img, 3)),
        is_training=False)
    return model, variables['params']


def test_adapt_tree_vit_resolution_and_head():
    _, src = _vit_params(32, num_classes=8)
    model, tgt = _vit_params(64, num_classes=5)
    adapted, report = adapt_tree(src, tgt)
    assert any('pos-embed interpolated 5 -> 17' in r for r in report)
    assert any('head re-initialised for 5 classes' in r for r in report)
    # every adapted leaf has the target's shape; the model must run with it
    jax.tree_util.tree_map(lambda a, b: np.testing.assert_array_equal(
        a.shape, b.shape), adapted, tgt)
    logits = model.apply({'params': adapted},
                         jnp.ones((2, 64, 64, 3)), is_training=False)
    assert logits.shape == (2, 5) and np.all(np.isfinite(logits))
    # non-head, non-pos leaves are carried over bit-exactly
    np.testing.assert_array_equal(
        adapted['Encoder_0']['EncoderBlock_0']['SelfAttentionBlock_0']
        ['queries']['kernel'],
        src['Encoder_0']['EncoderBlock_0']['SelfAttentionBlock_0']
        ['queries']['kernel'])


def test_adapt_restored_for_inference_resolution():
    """Serving a @32 checkpoint at --img_size 48: pos-embed interpolates,
    everything else passes through untouched (and a matching geometry is
    a true no-op)."""
    model8, src = _vit_params(32, num_classes=8)
    restored = {'params': src, 'ema_params': None, 'batch_stats': {},
                'step': 7}
    same, report = adapt_restored_for_inference(model8, restored, 32)
    assert report == [] and same['params'] is src

    adapted, report = adapt_restored_for_inference(model8, restored, 48)
    assert any('pos-embed interpolated 5 -> 10' in r for r in report)
    logits = model8.apply({'params': adapted['params']},
                          jnp.ones((2, 48, 48, 3)), is_training=False)
    assert logits.shape == (2, 8) and np.all(np.isfinite(logits))
    np.testing.assert_array_equal(
        adapted['params']['Dense_0']['kernel'], src['Dense_0']['kernel'])
    # ema params adapt alongside when present
    restored_ema = dict(restored, ema_params=src)
    adapted, report = adapt_restored_for_inference(model8, restored_ema, 48)
    assert sum('pos-embed interpolated' in r for r in report) == 2


def test_adapt_restored_for_inference_refuses_head_change():
    model5, _ = _vit_params(32, num_classes=5)
    _, src8 = _vit_params(32, num_classes=8)
    restored = {'params': src8, 'ema_params': None, 'batch_stats': {}}
    with pytest.raises(ValueError, match='--num_classes'):
        adapt_restored_for_inference(model5, restored, 32)


def test_adapt_tree_refuses_unadaptable_mismatch():
    # MLP-Mixer's token-mixing Dense is resolution-bound: no principled
    # interpolation exists, so the adapter must refuse loudly.
    from sav_tpu.models.mlp_mixer import MLPMixer

    def mixer_params(img):
        model = MLPMixer(num_classes=4, num_layers=1, embed_dim=32,
                         patch_shape=(16, 16), dtype=jnp.float32)
        return model.init(jax.random.PRNGKey(0),
                          jnp.ones((1, img, img, 3)),
                          is_training=False)['params']

    src, tgt = mixer_params(32), mixer_params(64)
    with pytest.raises(ValueError, match='cannot adapt'):
        adapt_tree(src, tgt)


def test_adapt_tree_refuses_structural_mismatch():
    _, src = _vit_params(32, num_classes=8)
    _, tgt = _vit_params(32, num_classes=8, model_name='vit_s_patch16')
    # same structure but different widths -> unadaptable leaf, not a
    # missing-key structural error
    with pytest.raises(ValueError):
        adapt_tree(src, tgt)


def test_adapt_tree_cvt_batch_stats_and_head():
    """BatchNorm model: class-count transfer must adapt the head, carry
    every other param bit-exactly, and map batch_stats 1:1 (their shapes
    are channel-only, so resolution/class changes never touch them)."""
    from sav_tpu.models.cvt import CvT

    def cvt_vars(num_classes):
        model = CvT(num_classes=num_classes, stage_sizes=(1, 1, 1),
                    num_heads=(1, 1, 2), embed_dim=(8, 8, 16),
                    dtype=jnp.float32)
        return model.init(jax.random.PRNGKey(0),
                          jnp.ones((1, 32, 32, 3)), is_training=True)

    src, tgt = cvt_vars(num_classes=6), cvt_vars(num_classes=3)
    params, report = adapt_tree(src['params'], tgt['params'])
    assert sorted(report) == [
        'Dense_0/bias: head re-initialised for 3 classes',
        'Dense_0/kernel: head re-initialised for 3 classes']
    stats, bs_report = adapt_tree(src['batch_stats'], tgt['batch_stats'],
                                  'batch_stats')
    assert bs_report == []      # carried over exactly, nothing adapted
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        stats, src['batch_stats'])


def test_adapt_tree_botnet_resolution_transfer():
    """BoTNet 32 -> 64: every BoT-stage rel-pos table is resampled (the
    feature grid doubles), convs/BN carry over, and the model runs."""
    from sav_tpu.models.botnet import BoTNet

    def botnet_vars(img):
        model = BoTNet(num_classes=4, stage_sizes=(1, 1, 1, 1),
                       num_heads=2, initial_filters=8,
                       dtype=jnp.float32)
        return jax.jit(model.init, static_argnames='is_training')(
            jax.random.PRNGKey(0), jnp.ones((1, img, img, 3)),
            is_training=False), model

    (src, _), (tgt, model) = botnet_vars(32), botnet_vars(64)
    params, report = adapt_tree(src['params'], tgt['params'])
    resampled = [r for r in report if 'rel-pos table resampled' in r]
    assert len(resampled) == 2      # rel_pos_emb_w + rel_pos_emb_h
    assert all('3 -> 7' in r for r in resampled)    # 2x2 -> 4x4 grid
    logits = model.apply({'params': params,
                          'batch_stats': tgt['batch_stats']},
                         jnp.ones((2, 64, 64, 3)), is_training=False)
    assert logits.shape == (2, 4) and np.all(np.isfinite(logits))


def test_trainer_finetune_from_checkpoint(tmp_path):
    """Pretrain 2 steps @32/8-way, fine-tune @64/5-way from the checkpoint:
    params must arrive adapted (pos-embed length 17) and train."""
    from sav_tpu.train import TrainConfig, Trainer

    pre_dir = os.fspath(tmp_path / 'pretrain')
    config = TrainConfig(model_name='vit_ti_patch16', img_size=32,
                         batch_size=8, total_steps=2, dtype='float32',
                         num_classes=8, dataset='synthetic',
                         checkpoint_dir=pre_dir, log_every=1,
                         eval_every_epochs=10**6,
                         checkpoint_every_epochs=10**6, eval_batches=1)
    pre = Trainer(config)
    pre.run()
    pre_pos = np.asarray(jax.device_get(
        pre.state.params['Encoder_0']['AddAbsPosEmbed_0']['pos_embed']))

    ft_config = TrainConfig(model_name='vit_ti_patch16', img_size=64,
                            batch_size=8, total_steps=1, dtype='float32',
                            num_classes=5, dataset='synthetic',
                            checkpoint_dir=os.fspath(tmp_path / 'ft'),
                            finetune_from=pre_dir, log_every=1,
                            eval_every_epochs=10**6,
                            checkpoint_every_epochs=10**6, eval_batches=1)
    ft = Trainer(ft_config)
    pos = np.asarray(jax.device_get(
        ft.state.params['Encoder_0']['AddAbsPosEmbed_0']['pos_embed']))
    assert pos.shape == (1, 17, pre_pos.shape[2])
    np.testing.assert_allclose(pos[0, 0], pre_pos[0, 0], rtol=1e-6)
    head = np.asarray(jax.device_get(ft.state.params['Dense_0']['kernel']))
    assert head.shape[-1] == 5 and not head.any()   # zero-init head
    # optimizer restarts fresh
    assert int(jax.device_get(ft.state.step)) == 0
    metrics = ft.run()
    assert np.isfinite(metrics['loss'])

    # a checkpoint in the run dir takes precedence over finetune_from
    resumed = Trainer(ft_config)
    assert int(jax.device_get(resumed.state.step)) == 1
