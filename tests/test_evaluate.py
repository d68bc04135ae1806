"""evaluate.py: standalone checkpoint evaluation must reproduce the
Trainer's own eval numbers on the same held-out slice (the reference has
no standalone eval entry point; its in-loop eval is train.py:239-252)."""

import numpy as np
import pytest

from evaluate import run_eval


@pytest.fixture(scope='module')
def trained(tmp_path_factory):
    """2-step ViT-Ti run on an npz source with a 25% holdout + EMA."""
    from sav_tpu.data.grain_loader import write_npz_shards
    from sav_tpu.train import TrainConfig, Trainer

    tmp = tmp_path_factory.mktemp('eval_ckpt')
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (64, 16, 16, 3), dtype=np.uint8)
    labels = rng.randint(0, 8, (64,))
    data_dir = str(tmp / 'npz')
    write_npz_shards(images, labels, data_dir, shard_size=32)

    ckpt_dir = str(tmp / 'ckpts')
    # images_per_epoch must match the tiny source or the warmup-cosine
    # schedule never leaves warmup (epoch math defaults to ImageNet's
    # 1.28M images) and 2 steps of ~1e-11 LR move params by less than a
    # float32 ulp — making EMA indistinguishable from the raw params
    config = TrainConfig(model_name='vit_ti_patch16', img_size=16,
                         batch_size=8, total_steps=2, dtype='float32',
                         num_classes=8, dataset=data_dir, lr=0.5,
                         images_per_epoch=64,
                         holdout_fraction=0.25, ema_decay=0.9,
                         checkpoint_dir=ckpt_dir, log_every=1,
                         eval_every_epochs=10**6,
                         checkpoint_every_epochs=10**6)
    trainer = Trainer(config)
    metrics = trainer.run()
    return data_dir, ckpt_dir, metrics


def test_run_eval_matches_trainer_eval(trained):
    data_dir, ckpt_dir, train_metrics = trained
    metrics = run_eval('vit_ti_patch16', ckpt_dir, data_dir,
                       img_size=16, batch_size=8, num_classes=8,
                       dtype='float32', holdout_fraction=0.25, seed=42)
    # full 16-image holdout walked (64 * 0.25), latest step restored
    assert metrics['eval_images'] == 16.0
    assert metrics['eval_step'] == 2
    for key in ('eval_loss', 'eval_top_1_acc', 'eval_top_5_acc'):
        np.testing.assert_allclose(metrics[key], train_metrics[key],
                                   rtol=1e-5, err_msg=key)


def test_run_eval_ema_toggle_and_batch_cap(trained):
    data_dir, ckpt_dir, _ = trained
    ema = run_eval('vit_ti_patch16', ckpt_dir, data_dir, img_size=16,
                   batch_size=8, num_classes=8, dtype='float32',
                   holdout_fraction=0.25, use_ema=True)
    raw = run_eval('vit_ti_patch16', ckpt_dir, data_dir, img_size=16,
                   batch_size=8, num_classes=8, dtype='float32',
                   holdout_fraction=0.25, use_ema=False)
    # EMA after 2 steps sits between init and current params — a different
    # parameter set, so the loss must differ (guards the selection wiring)
    assert ema['eval_loss'] != raw['eval_loss']
    # eval_batches caps the walk
    one = run_eval('vit_ti_patch16', ckpt_dir, data_dir, img_size=16,
                   batch_size=8, num_classes=8, dtype='float32',
                   holdout_fraction=0.25, eval_batches=1)
    assert one['eval_images'] == 8.0


def test_run_eval_missing_checkpoint_raises(trained, tmp_path):
    import click
    data_dir, _, _ = trained
    with pytest.raises(click.ClickException, match='no checkpoint'):
        run_eval('vit_ti_patch16', str(tmp_path / 'nowhere'), data_dir,
                 img_size=16, batch_size=8, num_classes=8, dtype='float32')


def test_run_eval_quantized_serving_kernels(trained):
    """--quantized ff scores through the int8 FF serving kernel (interpret
    mode off-TPU): a different forward, so close to but not identical with
    the bf16-path loss."""
    data_dir, ckpt_dir, _ = trained
    q = run_eval('vit_ti_patch16', ckpt_dir, data_dir, img_size=16,
                 batch_size=8, num_classes=8, dtype='float32',
                 holdout_fraction=0.25, quantized='ff')
    raw = run_eval('vit_ti_patch16', ckpt_dir, data_dir, img_size=16,
                   batch_size=8, num_classes=8, dtype='float32',
                   holdout_fraction=0.25)
    assert q['eval_images'] == 16.0
    assert np.isfinite(q['eval_loss'])
    np.testing.assert_allclose(q['eval_loss'], raw['eval_loss'], rtol=0.1)


def test_run_eval_pos_embed_must_match_training(tmp_path):
    """A rotary-trained checkpoint evaluates under --pos_embed rotary (the
    param trees differ from learned: no pos_embed table), reproducing the
    trainer's held-out eval numbers."""
    from sav_tpu.data.grain_loader import write_npz_shards
    from sav_tpu.train import TrainConfig, Trainer

    rng = np.random.RandomState(1)
    data_dir = str(tmp_path / 'npz')
    write_npz_shards(rng.randint(0, 256, (32, 16, 16, 3), dtype=np.uint8),
                     rng.randint(0, 4, (32,)), data_dir, shard_size=32)
    ckpt_dir = str(tmp_path / 'ck')
    config = TrainConfig(model_name='vit_ti_patch16', img_size=16,
                         batch_size=8, total_steps=2, dtype='float32',
                         num_classes=4, dataset=data_dir,
                         images_per_epoch=32, pos_embed='rotary',
                         holdout_fraction=0.25, checkpoint_dir=ckpt_dir,
                         log_every=1, eval_every_epochs=10**6,
                         checkpoint_every_epochs=10**6)
    train_metrics = Trainer(config).run()
    metrics = run_eval('vit_ti_patch16', ckpt_dir, data_dir, img_size=16,
                       batch_size=8, num_classes=4, dtype='float32',
                       holdout_fraction=0.25, pos_embed='rotary')
    np.testing.assert_allclose(metrics['eval_loss'],
                               train_metrics['eval_loss'], rtol=1e-5)
