"""Training entry point, CLI-compatible with the reference trainer.

Same flags as reference train.py:130-190 (data_dir, img_size, num_epochs,
batch_size, label_smoothing, augmentation, model_name, lr, weight_decay,
clip_grad, checkpoint_dir, seed) plus TPU-native extensions (dtype, mesh
model-parallelism, total-steps override, synthetic dataset for smoke runs).

Example:
    python train.py --data_dir synthetic -m vit_b_patch16 -c /tmp/ckpts \
        -b 256 --total_steps 100
"""

import click

try:
    from click_option_group import optgroup
except ImportError:  # flat flags when click_option_group isn't installed
    class _OptGroup:
        def group(self, *args, **kwargs):
            return lambda f: f

        def option(self, *args, **kwargs):
            return click.option(*args, **kwargs)

    optgroup = _OptGroup()

from sav_tpu.train import TrainConfig, Trainer


@click.command()
@optgroup.group('Dataset configuration')
@optgroup.option('--data_dir', type=str, required=True,
                 help="dataset: 'synthetic', an .npz path/glob, a directory "
                      "of .npz shards, an ImageFolder JPEG tree, or .tar "
                      "shard(s) of JPEGs")
@optgroup.group('Training configuration')
@optgroup.option('-s', '--img_size', type=int, default=224,
                 help='image size (default: 224)')
@optgroup.option('-e', '--num_epochs', type=int, default=300,
                 help='training epochs (default: 300)')
@optgroup.option('-b', '--batch_size', type=int, default=32,
                 help='global batch size (default: 32)')
@optgroup.option('--label_smoothing', type=float, default=0.1,
                 help='label smoothing alpha (default: 0.1)')
@optgroup.group('Data augmentation configuration')
@optgroup.option('--augmentation', type=str,
                 default='cutmix_mixup_randaugment_405',
                 help='augmentation strategy')
@optgroup.group('Model configuration')
@optgroup.option('-m', '--model_name', type=str, required=True,
                 help='model name (see sav_tpu.available_models())')
@optgroup.group('Optimizer and schedule configuration')
@optgroup.option('-l', '--lr', type=float, default=5e-4,
                 help='base learning rate (default: 5e-4)')
@optgroup.option('--weight_decay', type=float, default=1e-4,
                 help='weight decay (default: 1e-4)')
@optgroup.option('--clip_grad', type=float, default=None,
                 help='global-norm gradient clip (default: off)')
@optgroup.group('Miscellaneous')
@optgroup.option('-c', '--checkpoint_dir', type=str, required=True,
                 help='checkpoint directory')
@optgroup.option('--seed', type=int, default=42, help='PRNG seed')
@optgroup.group('TPU-native extensions')
@optgroup.option('--dtype', type=str, default='bfloat16',
                 help='model compute dtype')
@optgroup.option('--model_parallelism', type=int, default=1,
                 help='tensor-parallel mesh axis size')
@optgroup.option('--pipeline_parallelism', type=int, default=1,
                 help='GPipe stage count over the pipe mesh axis '
                      '(needs --scan_layers; dropout-free configs only)')
@optgroup.option('--pipeline_microbatches', type=int, default=4,
                 help='microbatches per pipelined step; bubble fraction '
                      'is (stages-1)/(microbatches+stages-1)')
@optgroup.option('--total_steps', type=int, default=None,
                 help='override total step count (smoke tests)')
@optgroup.option('--scan_layers/--no-scan_layers', default=False,
                 help='nn.scan over encoder depth (fast compiles)')
@optgroup.option('--remat',
                 type=click.Choice(['none', 'full', 'dots',
                                    'dots_no_batch']),
                 default='none',
                 help='backward rematerialization policy: full recomputes '
                      'the whole forward; dots saves matmul outputs; '
                      'dots_no_batch also recomputes batched (attention) '
                      'matmuls')
@optgroup.option('--mu_dtype', type=str, default=None,
                 help="first-Adam-moment dtype (e.g. 'bfloat16')")
@optgroup.option('--ema_decay', type=float, default=None,
                 help='params EMA decay (e.g. 0.9999); eval uses the EMA')
@optgroup.option('--schedule', type=click.Choice(['cosine', 'wsd']),
                 default='cosine', help='LR schedule family')
@optgroup.option('--pos_embed',
                 type=click.Choice(['learned', 'fixed', 'rotary', 'none']),
                 default='learned',
                 help='ViT position embedding: learned absolute (reference '
                      'default), fixed sinusoidal, or rotary on q/k')
@optgroup.option('--quantized',
                 type=click.Choice(['none', 'int8', 'ff', 'ff_sb']),
                 default='none',
                 help="int8 QAT: 'int8' = per-matmul forward, 'ff' = "
                      'whole-FF Pallas kernel (faster than bf16 on v5e), '
                      "'ff_sb' = 'ff' + SwitchBack int8 dx backward")
@optgroup.option('--grad_accum', type=click.IntRange(min=1), default=1,
                 help='accumulate gradients over N microbatches per '
                      'optimizer step (same effective batch, 1/N '
                      'activation memory)')
@optgroup.option('--steps_per_dispatch', type=int, default=1,
                 help='chain N train steps per device dispatch (hides host '
                      'round-trip latency; >1 scans N steps in one jit)')
@optgroup.option('--prefetch_chunks', type=int, default=2,
                 help='chunks decoded ahead of the consuming dispatch '
                      '(chained-host loop)')
@optgroup.option('--images_per_epoch', type=click.IntRange(min=1),
                 default=None,
                 help='dataset size for epoch math (schedule warmup, eval '
                      'cadence); default: ImageNet-1k 1,281,167')
@optgroup.option('--data_workers', type=int, default=0,
                 help='Grain worker processes for host decode '
                      '(0 = in-process reader threads)')
@optgroup.option('--eval_data_dir', type=str, default=None,
                 help='separate eval dataset; default: a held-out '
                      '--holdout_fraction slice of --data_dir (real '
                      'sources), or the validation/test split (tfds:)')
@optgroup.option('--holdout_fraction', type=float, default=0.05,
                 help='fraction of --data_dir held out for eval when no '
                      '--eval_data_dir/?split= is given (0 disables)')
@optgroup.option('--eval_batches', type=int, default=None,
                 help='eval batches per evaluation; default: the full '
                      'eval split (finite sources)')
@optgroup.option('--eval_every_epochs', type=int, default=5,
                 help='mid-training eval cadence in epochs (0 disables; '
                      'a final eval always runs)')
@optgroup.option('--finetune_from', type=str, default=None,
                 help='checkpoint dir to fine-tune from: fresh optimizer/'
                      'schedule, classifier head re-initialised on class-'
                      'count change, pos-embed grids interpolated on '
                      'resolution change (224->384 transfer)')
@optgroup.option('--finetune_use_ema/--no-finetune_use_ema', default=False,
                 help="initialise from the checkpoint's EMA params")
@optgroup.option('--num_classes', type=int, default=1000,
                 help='classifier label count (default: 1000)')
@optgroup.option('--wandb/--no-wandb', 'use_wandb', default=False)
def main(data_dir, img_size, num_epochs, batch_size, label_smoothing,
         augmentation, model_name, lr, weight_decay, clip_grad,
         checkpoint_dir, seed, dtype, model_parallelism,
         pipeline_parallelism, pipeline_microbatches, total_steps,
         scan_layers, remat, mu_dtype, ema_decay, schedule, pos_embed,
         quantized, grad_accum, steps_per_dispatch, prefetch_chunks,
         images_per_epoch,
         data_workers, eval_data_dir,
         holdout_fraction, eval_batches, eval_every_epochs, finetune_from,
         finetune_use_ema, num_classes, use_wandb):
    # absl buffers INFO below its standalone default — without this the
    # per-step metric lines (and 'restoring checkpoint at step N') never
    # reach the terminal
    from absl import logging as absl_logging
    absl_logging.set_verbosity(absl_logging.INFO)
    config = TrainConfig(
        model_name=model_name,
        img_size=img_size,
        num_epochs=num_epochs,
        batch_size=batch_size,
        label_smoothing=label_smoothing,
        augmentation=augmentation,
        lr=lr,
        weight_decay=weight_decay,
        clip_grad=clip_grad,
        checkpoint_dir=checkpoint_dir,
        seed=seed,
        dtype=dtype,
        dataset='synthetic' if data_dir == 'synthetic' else data_dir,
        model_parallelism=model_parallelism,
        pipeline_parallelism=pipeline_parallelism,
        pipeline_microbatches=pipeline_microbatches,
        total_steps=total_steps,
        scan_layers=scan_layers,
        remat=False if remat == 'none' else remat,
        mu_dtype=mu_dtype,
        ema_decay=ema_decay,
        schedule=schedule,
        pos_embed=pos_embed,
        quantized=False if quantized == 'none' else (
            True if quantized == 'int8' else quantized),
        grad_accum=grad_accum,
        steps_per_dispatch=steps_per_dispatch,
        prefetch_chunks=prefetch_chunks,
        data_workers=data_workers,
        eval_dataset=eval_data_dir,
        holdout_fraction=holdout_fraction,
        eval_batches=eval_batches,
        eval_every_epochs=eval_every_epochs,
        finetune_from=finetune_from,
        finetune_use_ema=finetune_use_ema,
        num_classes=num_classes,
        **({'images_per_epoch': images_per_epoch}
           if images_per_epoch is not None else {}),
    )
    metrics = Trainer(config, use_wandb=use_wandb).run()
    click.echo(f'final metrics: {metrics}')


if __name__ == '__main__':
    main()
