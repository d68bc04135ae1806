"""Batched inference CLI — the serving surface the reference never had.

Loads an Orbax checkpoint produced by ``train.py``, decodes JPEGs on the
host (the training loader's decode: native C++ libjpeg tier with PIL
draft-mode fallback, ``sav_tpu/native``), runs the on-device
eval transform (resize-small -> central crop -> normalize, reference:
data/preprocess/preprocess.py:191-204) plus the model forward in ONE jit,
and prints one JSON line per image with the top-k classes. Missing
checkpoint directories fall back to random init (smoke mode) with a
warning.

Example:
    python predict.py -m vit_s_patch16 -c /tmp/ckpts \
        --images '/data/val/**/*.jpg' --top_k 5
"""

import glob
import json
import os
import sys
import time

import click
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir',
                  os.path.expanduser('~/.jax_cache'))

from sav_tpu.data.jpeg_source import decode_jpeg_fixed
from sav_tpu.data.preprocess import eval_preprocess
from sav_tpu.models import create_model
from sav_tpu.train.checkpoint import CheckpointManager


def _list_images(pattern: str):
    if os.path.isdir(pattern):
        found = sorted(
            p for p in glob.glob(os.path.join(pattern, '**', '*'),
                                 recursive=True)
            if p.lower().endswith(('.jpg', '.jpeg', '.png')))
    else:
        found = sorted(glob.glob(pattern, recursive=True))
    if not found:
        raise click.ClickException(f'no images match {pattern!r}')
    return found


@click.command()
@click.option('-m', '--model_name', required=True)
@click.option('-c', '--checkpoint_dir', required=True,
              help='train.py checkpoint directory')
@click.option('--images', required=True,
              help='image directory or glob pattern')
@click.option('-s', '--img_size', type=int, default=224)
@click.option('-b', '--batch_size', type=int, default=32)
@click.option('--top_k', type=int, default=5)
@click.option('--num_classes', type=int, default=1000)
@click.option('--dtype', default='bfloat16')
@click.option('--ema/--no-ema', default=True,
              help='use the EMA params when the checkpoint carries them')
@click.option('--class_names', type=str, default=None,
              help='optional text file, one class name per line')
@click.option('--quantized',
              type=click.Choice(['none', 'int8', 'ff', 'all']),
              default='none',
              help="int8 serving: 'ff' runs each FF sublayer as one int8 "
                   "Pallas kernel — measured 1.23x bf16 inference "
                   "throughput on ViT-B @224 and 1.20x on Mixer-B "
                   "(channel-mix FFs; benchmarks/infer_int8_probe.py, "
                   "serve_sweep.py). CvT: measured a LOSS at its narrow "
                   "FF widths, receipts in docs/PERFORMANCE.md — stay "
                   "bf16 there. Weights quantize on the fly, so pair "
                   "with a QAT (--quantized ff) checkpoint for best "
                   "accuracy")
def main(model_name, checkpoint_dir, images, img_size, batch_size, top_k,
         num_classes, dtype, ema, class_names, quantized):
    q = False if quantized == 'none' else (
        True if quantized == 'int8' else quantized)   # train.py mapping
    model = create_model(model_name, num_classes=num_classes,
                         dtype=jnp.dtype(dtype),
                         **({'quantized': q} if q else {}))
    variables = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(0), jnp.ones((1, img_size, img_size, 3)),
        is_training=False)
    serving = {'params': variables['params'],
               'batch_stats': variables.get('batch_stats', {}),
               'ema_params': None}
    ckpt = CheckpointManager(checkpoint_dir)
    restored = ckpt.restore_for_inference()
    if restored is None:
        click.echo(f'WARNING: no checkpoint in {checkpoint_dir}; '
                   'predicting from random init', err=True)
    else:
        from sav_tpu.train.finetune import adapt_restored_for_inference
        serving, report = adapt_restored_for_inference(model, restored,
                                                       img_size)
        click.echo(f"restored checkpoint at step {restored['step']}",
                   err=True)
        for line in report:    # e.g. pos-embed interpolated for --img_size
            click.echo(f'  {line}', err=True)
    ckpt.close()
    use_ema = ema and serving['ema_params'] is not None
    params = serving['ema_params'] if use_ema else serving['params']
    serve_vars = {'params': params}
    if serving['batch_stats']:
        serve_vars['batch_stats'] = serving['batch_stats']

    names = None
    if class_names:
        with open(class_names) as f:
            names = [line.strip() for line in f if line.strip()]

    @jax.jit
    def serve(raw):
        x = jax.vmap(lambda im: eval_preprocess(im.astype(jnp.float32),
                                                img_size))(raw)
        logits = model.apply(serve_vars, x.astype(model.dtype),
                             is_training=False)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        top = jax.lax.top_k(probs, top_k)
        return top

    paths = _list_images(images)
    decode_size = max(img_size, int(round(img_size * 256 / 224)))
    start = time.perf_counter()
    done = 0
    for lo in range(0, len(paths), batch_size):
        chunk = paths[lo:lo + batch_size]
        raw = np.stack([decode_jpeg_fixed(p, decode_size) for p in chunk])
        if len(chunk) < batch_size:   # pad to the compiled batch shape
            pad = np.zeros((batch_size - len(chunk), *raw.shape[1:]),
                           raw.dtype)
            raw = np.concatenate([raw, pad])
        probs, idx = serve(raw)
        probs, idx = np.asarray(probs), np.asarray(idx)
        for row, path in enumerate(chunk):
            classes = [
                {'class': (names[i] if names and i < len(names) else int(i)),
                 'prob': round(float(p), 5)}
                for i, p in zip(idx[row], probs[row])]
            print(json.dumps({'path': path, 'top_k': classes}))
        done += len(chunk)
    elapsed = time.perf_counter() - start
    click.echo(f'{done} images in {elapsed:.2f}s '
               f'({done / elapsed:.1f} img/s incl. host decode)', err=True)


if __name__ == '__main__':
    main()
