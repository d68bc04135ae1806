"""Convert a reference (flax.training.checkpoints) checkpoint to sav_tpu.

The reference saved its whole TrainState with flax's legacy checkpointing
(reference: train.py:123-127). This tool loads it, extracts the model
variables, optionally stacks encoder layers for scan_layers models, and
writes a sav_tpu Orbax checkpoint that `Trainer` restores from.

Usage:
  python scripts/convert_reference_checkpoint.py REF_CKPT_DIR OUT_DIR \
      --model vit_b_patch16 [--scan-layers]
"""

import argparse
import sys

sys.path.insert(0, '.')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('ref_dir')
    parser.add_argument('out_dir')
    parser.add_argument('--model', required=True)
    parser.add_argument('--num-classes', type=int, default=1000)
    parser.add_argument('--scan-layers', action='store_true')
    # These must match the flags of the training run that will RESTORE the
    # converted checkpoint: the optimizer-state pytree structure depends on
    # them (clip adds a state leaf, ema adds ema_params, mu_dtype changes a
    # leaf dtype), and Orbax restores into an exact template. Defaults
    # mirror TrainConfig defaults.
    parser.add_argument('--weight-decay', type=float, default=1e-4)
    parser.add_argument('--clip-grad', type=float, default=None)
    parser.add_argument('--mu-dtype', default=None)
    parser.add_argument('--ema', action='store_true')
    args = parser.parse_args()

    import jax.numpy as jnp
    from flax.training import checkpoints as flax_checkpoints

    from sav_tpu.train.checkpoint import CheckpointManager
    from sav_tpu.train.state import TrainState, build_optimizer
    from sav_tpu.utils.stacking import stack_layer_params

    restored = flax_checkpoints.restore_checkpoint(args.ref_dir, target=None)
    if restored is None:
        raise SystemExit(f'no checkpoint found in {args.ref_dir}')

    # the reference stored model.init output under TrainState.params; find
    # the variables dict whichever way it was nested
    variables = restored.get('params', restored)
    if not ('params' in variables and isinstance(variables['params'], dict)):
        variables = {'params': variables}

    params = variables['params']
    if args.scan_layers:
        for key in list(params):
            if key.startswith('Encoder_'):
                params[key] = stack_layer_params(params[key])

    # schedule-based (callable) LR so opt_state gets the same
    # ScaleByScheduleState structure Trainer's cosine/wsd chains produce
    tx = build_optimizer(lambda step: 1e-3,
                         weight_decay=args.weight_decay,
                         clip_grad=args.clip_grad,
                         mu_dtype=args.mu_dtype)
    state_vars = {'params': params}
    if 'batch_stats' in variables:
        state_vars['batch_stats'] = variables['batch_stats']
    state = TrainState.create(state_vars, tx, ema=args.ema)
    step = int(restored.get('step', 0))
    state = state.replace(step=jnp.asarray(step, jnp.int32))

    manager = CheckpointManager(args.out_dir)
    manager.save(step, state)
    manager.wait()
    manager.close()
    print(f'wrote sav_tpu checkpoint for {args.model} at step {step} '
          f'to {args.out_dir}')


if __name__ == '__main__':
    main()
