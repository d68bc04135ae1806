"""Convert a google-research vision_transformer (AugReg) npz ViT checkpoint.

Companion to scripts/import_hf_checkpoint.py for the other big pretrained-
ViT ecosystem: the original ViT / "How to train your ViT" releases ship as
flat npz files. Converts with ``sav_tpu.utils.npz_import.convert_vit_npz``
(re-nesting + the patch-bias -> pos-embed fold; tensors are flax-native so
no transposes) and writes a sav_tpu Orbax checkpoint plus a ``model.json``
spec that every CLI accepts as the model name (``-m OUT_DIR/model.json``).

in21k pretrains (with a ``pre_logits`` bottleneck) import as trunks with a
zero-initialized ``--num-classes`` head, ready for --finetune_from.

Usage:
  python scripts/import_vit_npz.py CKPT.npz OUT_DIR [--scan-layers] [--ema]
"""

import argparse
import sys

sys.path.insert(0, '.')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('npz_path', help='vision_transformer .npz checkpoint')
    parser.add_argument('out_dir')
    parser.add_argument('--scan-layers', action='store_true')
    # must match the flags of the run that restores (Orbax restores into an
    # exact optimizer-state template; see convert_reference_checkpoint.py)
    parser.add_argument('--weight-decay', type=float, default=1e-4)
    parser.add_argument('--clip-grad', type=float, default=None)
    parser.add_argument('--mu-dtype', default=None)
    parser.add_argument('--ema', action='store_true')
    parser.add_argument('--num-classes', type=int, default=1000,
                        help='head width for pre_logits (in21k) '
                             'checkpoints; zero-init head')
    args = parser.parse_args()

    import json
    import os

    import numpy as np

    from sav_tpu.train.checkpoint import CheckpointManager
    from sav_tpu.train.state import TrainState, build_optimizer
    from sav_tpu.utils.hf_import import model_spec
    from sav_tpu.utils.npz_import import convert_vit_npz
    from sav_tpu.utils.stacking import stack_layer_params

    with np.load(args.npz_path) as npz:
        params, model_kwargs = convert_vit_npz(npz,
                                               num_classes=args.num_classes)
    if args.scan_layers:
        params['Encoder_0'] = stack_layer_params(params['Encoder_0'])

    tx = build_optimizer(lambda step: 1e-3,
                         weight_decay=args.weight_decay,
                         clip_grad=args.clip_grad,
                         mu_dtype=args.mu_dtype)
    state = TrainState.create({'params': params}, tx, ema=args.ema)
    manager = CheckpointManager(args.out_dir)
    manager.save(0, state)
    manager.wait()
    manager.close()

    spec = model_spec(model_kwargs, scan_layers=args.scan_layers)
    spec_path = os.path.join(args.out_dir, 'model.json')
    with open(spec_path, 'w') as f:
        json.dump(spec, f, indent=1)
    pos_len = params['Encoder_0']['AddAbsPosEmbed_0']['pos_embed'].shape[1]
    grid = int(round((pos_len - 1) ** 0.5))
    img = grid * model_kwargs['patch_shape'][0]
    print(f'wrote sav_tpu checkpoint to {args.out_dir}')
    print(f'wrote model spec to {spec_path} (pos-embed grid {grid}x{grid} '
          f'-> native image size {img})')
    print('use it with any CLI, e.g.')
    print(f'  python evaluate.py -m {spec_path} -c {args.out_dir} '
          f'--data_dir <eval data> --img_size {img}')
    print(f'  python predict.py -m {spec_path} -c {args.out_dir} '
          f'--images <glob> --img_size {img}')


if __name__ == '__main__':
    main()
