"""Layer-granularity fusion measurement (VERDICT r2 #2).

Measures the full ViT-B/16 train step (bf16, scan-chained, forced
completion — the bench.py methodology) with the attention sublayer run
four ways:

  default          — per-op auto dispatch (XLA at @224): the 992 img/s
                     round-2 headline path.
  fused_layer_xla  — ONE custom_vjp per layer, XLA inside, flash-style
                     residuals (lse instead of the [B,H,L,L] probs).
                     Isolates the boundary + residual-choice cost.
  fused_layer      — same boundary, Pallas flash core inside.
  fused_layer_full — same boundary, the whole forward as one Pallas kernel.

Run each mode in its OWN process (TPU allocations stack otherwise):

    python benchmarks/fused_layer_bench.py default
    python benchmarks/fused_layer_bench.py fused_layer_xla
    ...

Prints one JSON line per run.
"""

import argparse
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

MODES = ('default', 'xla_baseline', 'fused_layer_xla', 'fused_layer',
         'fused_layer_full', 'fused_block', 'fused_block_full')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('mode', choices=MODES)
    parser.add_argument('--model', default='vit_b_patch16')
    parser.add_argument('--batch-size', type=int, default=192)
    parser.add_argument('--img', type=int, default=224)
    parser.add_argument('--steps', type=int, default=50)
    args = parser.parse_args()

    import bench
    from sav_tpu.models import create_model
    from sav_tpu.train import steps as steps_lib
    from sav_tpu.train.state import TrainState, build_optimizer

    # 'default' = the shipped auto dispatch; 'xla_baseline' = the per-op
    # jnp/XLA path (the pre-round-3 headline baseline)
    if args.mode == 'default':
        kwargs = {}
    elif args.mode == 'xla_baseline':
        kwargs = {'use_kernel': False}
    else:
        kwargs = {'use_kernel': args.mode}
    model = create_model(args.model, num_classes=1000,
                         dtype=jnp.bfloat16, **kwargs)
    tx = build_optimizer(1e-3, weight_decay=1e-4)
    variables = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(0), jnp.ones((1, args.img, args.img, 3)),
        is_training=False)
    state = TrainState.create(variables, tx)
    rng = jax.random.PRNGKey(2)

    def step(state, batch, i):
        new_state, metrics = steps_lib.train_step(
            state, batch, rng, model=model, tx=tx, num_classes=1000,
            label_smoothing=0.1)
        return new_state, metrics['loss']

    print(f'# compiling {args.model} {args.mode} @{args.img} '
          f'bs{args.batch_size}...',
          flush=True)
    sec = bench._time_scan(step, state, bench._batch(args.batch_size,
                                                     args.img),
                           steps=args.steps)
    print(json.dumps({
        'mode': args.mode,
        'model': args.model,
        'img': args.img,
        'batch_size': args.batch_size,
        'ms_per_step': round(sec * 1e3, 2),
        'images_per_sec': round(args.batch_size / sec, 1),
        'backend': jax.default_backend(),
    }), flush=True)


if __name__ == '__main__':
    main()
