"""Standalone evaluation CLI: checkpoint -> accuracy on an eval source.

Completes the workflow around ``train.py`` (which evaluates only on its
own cadence) and ``predict.py`` (which scores no labels): restore a
checkpoint and measure loss / top-1 / top-5 on any data source the
framework can read — an ImageFolder JPEG tree, a webdataset-style tar,
an ``.npz`` shard, a ``tfds:`` spec, or ``synthetic`` — with the same
mask-aware full-split eval the Trainer runs (reference pads its eval
split the same way, data/input_pipeline.py:360-376; the reference has no
standalone eval entry point at all).

The eval transform is the clean resize-small -> central-crop -> normalize
path (reference data/preprocess/preprocess.py:191-204); no augmentation
ever runs. ``--holdout_fraction`` selects the SAME tail slice of a single
source the Trainer holds out by default, so a training run's eval numbers
are reproducible after the fact:

    python evaluate.py -m vit_s_patch16 -c /ckpts --data_dir /data/train \
        --holdout_fraction 0.05

Explicit splits work too: ``--data_dir '/data/val?split=[90%:]'``.
"""

import json
import os
import time

import click
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.jax_cache'))

import optax

from sav_tpu.models import create_model
from sav_tpu.parallel import mesh as mesh_lib
from sav_tpu.train.checkpoint import CheckpointManager
from sav_tpu.utils.metrics import topk_correct


def build_eval_fn(model, mesh, num_classes: int):
    """Jitted ``fn(variables, batch) -> summed metrics`` over the mesh.

    Same math as ``train.steps.eval_step`` but on raw variables, so it
    works from a template-free inference restore (no optimizer state)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def fn(variables, batch):
        images = batch['images'].astype(model.dtype)
        logits = model.apply(variables, images, is_training=False)
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

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(mesh_lib.DATA_AXIS))
    return jax.jit(fn, in_shardings=(repl, batch_sh), out_shardings=repl)


def run_eval(model_name: str, checkpoint_dir: str, data_dir: str,
             img_size: int = 224, batch_size: int = 32,
             num_classes: int = 1000, dtype: str = 'bfloat16',
             use_ema: bool = True, eval_batches=None,
             holdout_fraction: float = 0.0, seed: int = 42,
             data_workers: int = 0, quantized=False,
             pos_embed: str = 'learned', step=None):
    """Returns per-example-mean eval metrics (+'eval_images', 'eval_step').

    ``holdout_fraction`` > 0 evaluates the tail slice of ``data_dir`` that
    a Trainer with the same fraction held out of training (disjoint
    permutation split — sav_tpu/train/loop.py Trainer._dataset)."""
    mesh = mesh_lib.create_mesh()
    model_kwargs = {}
    if pos_embed != 'learned':
        model_kwargs['pos_embed'] = pos_embed
    if quantized:
        model_kwargs['quantized'] = quantized
    model = create_model(model_name, num_classes=num_classes,
                         dtype=jnp.dtype(dtype), **model_kwargs)

    ckpt = CheckpointManager(checkpoint_dir)
    try:
        restored = ckpt.restore_for_inference(step=step)
    finally:
        ckpt.close()
    if restored is None:
        raise click.ClickException(f'no checkpoint in {checkpoint_dir}')
    from sav_tpu.train.finetune import adapt_restored_for_inference
    restored, adapt_report = adapt_restored_for_inference(model, restored,
                                                          img_size)
    for line in adapt_report:   # e.g. pos-embed interpolated for img_size
        click.echo(f'  {line}', err=True)
    params = restored['params']
    if use_ema and restored.get('ema_params') is not None:
        params = restored['ema_params']
    variables = {'params': params}
    if restored['batch_stats']:
        variables['batch_stats'] = restored['batch_stats']

    from sav_tpu.data.pipeline import create_dataset, parse_dataset_spec

    split = None
    base, inline = parse_dataset_spec(data_dir)
    if (inline is None and holdout_fraction
            and not base.startswith('tfds:')):
        split = ('holdout', 1.0 - holdout_fraction, 1.0)
    # seed + 1 matches the Trainer's eval dataset (seed_offset=1), so the
    # numbers line up with what train.py logged for the same checkpoint
    dataset = create_dataset(data_dir, batch_size=batch_size,
                             image_size=img_size, num_classes=num_classes,
                             seed=seed + 1, mesh=mesh, training=False,
                             num_workers=data_workers, split=split)
    eval_fn = build_eval_fn(model, mesh, num_classes)

    if eval_batches is None:
        eval_batches = getattr(dataset, 'num_batches', None) or 16
    sums = None
    start = time.perf_counter()
    for i in range(eval_batches):
        try:
            batch = dataset.batch(i)
        except StopIteration:
            break
        out = jax.device_get(eval_fn(variables, batch))
        sums = out if sums is None else jax.tree_util.tree_map(
            np.add, sums, out)
    elapsed = time.perf_counter() - start
    if sums is None:
        return {}
    count = max(float(sums.pop('eval_count')), 1.0)
    metrics = {k: float(v) / count for k, v in sums.items()}
    metrics['eval_images'] = count
    metrics['eval_step'] = int(restored['step'])
    metrics['images_per_sec'] = count / max(elapsed, 1e-9)
    return metrics


@click.command()
@click.option('-m', '--model_name', required=True)
@click.option('-c', '--checkpoint_dir', required=True,
              help='train.py checkpoint directory')
@click.option('--data_dir', required=True,
              help="eval source: JPEG tree / tar / .npz / 'tfds:name' / "
                   "'synthetic'; may carry a ?split= suffix")
@click.option('-s', '--img_size', type=int, default=224)
@click.option('-b', '--batch_size', type=int, default=32)
@click.option('--num_classes', type=int, default=1000)
@click.option('--dtype', default='bfloat16')
@click.option('--ema/--no-ema', 'use_ema', default=True,
              help='use the EMA params when the checkpoint carries them')
@click.option('--eval_batches', type=int, default=None,
              help='batches to score; default: the full split')
@click.option('--holdout_fraction', type=float, default=0.0,
              help="score the tail slice a Trainer with the same fraction "
                   'held out of training (reproduces its eval numbers)')
@click.option('--seed', type=int, default=42,
              help='must match the training --seed for holdout parity')
@click.option('--data_workers', type=int, default=0)
@click.option('--quantized', type=click.Choice(['none', 'int8', 'ff', 'all']),
              default='none', help='int8 serving kernels (see predict.py)')
@click.option('--pos_embed', type=click.Choice(['learned', 'fixed',
                                                'rotary']),
              default='learned',
              help='must match the training --pos_embed')
@click.option('--step', type=int, default=None,
              help='checkpoint step to restore (default: latest)')
def main(model_name, checkpoint_dir, data_dir, img_size, batch_size,
         num_classes, dtype, use_ema, eval_batches, holdout_fraction,
         seed, data_workers, quantized, pos_embed, step):
    q = False if quantized == 'none' else (
        True if quantized == 'int8' else quantized)
    metrics = run_eval(model_name, checkpoint_dir, data_dir,
                       img_size=img_size, batch_size=batch_size,
                       num_classes=num_classes, dtype=dtype,
                       use_ema=use_ema, eval_batches=eval_batches,
                       holdout_fraction=holdout_fraction, seed=seed,
                       data_workers=data_workers, quantized=q,
                       pos_embed=pos_embed, step=step)
    if not metrics:
        raise click.ClickException('eval source produced no batches')
    print(json.dumps({k: (round(v, 6) if isinstance(v, float) else v)
                      for k, v in metrics.items()}))


if __name__ == '__main__':
    main()
