"""Convert a timm (pytorch-image-models) ViT state dict to sav_tpu.

Third import path (HF dirs: import_hf_checkpoint.py; AugReg npz:
import_vit_npz.py): timm/DeiT releases ship as torch ``.pth`` files holding
a VisionTransformer state dict (optionally wrapped in a ``model`` /
``state_dict`` envelope, as torch-hub DeiT checkpoints are). Converts with
``sav_tpu.utils.timm_import.convert_timm_vit`` and writes a sav_tpu Orbax
checkpoint plus a ``model.json`` spec every CLI accepts as the model name.

The state dict carries no head count (q/k/v are fused); pass --num-heads
for non-standard geometries (default: embed_dim // 64).

Usage:
  python scripts/import_timm_checkpoint.py CKPT.pth OUT_DIR \
      [--num-heads N] [--scan-layers] [--ema]
"""

import argparse
import sys

sys.path.insert(0, '.')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('pth_path', help='timm ViT checkpoint (.pth/.bin)')
    parser.add_argument('out_dir')
    parser.add_argument('--num-heads', type=int, default=None)
    parser.add_argument('--scan-layers', action='store_true')
    # must match the flags of the run that restores (Orbax restores into an
    # exact optimizer-state template; see convert_reference_checkpoint.py)
    parser.add_argument('--weight-decay', type=float, default=1e-4)
    parser.add_argument('--clip-grad', type=float, default=None)
    parser.add_argument('--mu-dtype', default=None)
    parser.add_argument('--ema', action='store_true')
    parser.add_argument('--num-classes', type=int, default=1000,
                        help='head width for trunk-only checkpoints')
    args = parser.parse_args()

    import json
    import os

    import torch

    from sav_tpu.train.checkpoint import CheckpointManager
    from sav_tpu.train.state import TrainState, build_optimizer
    from sav_tpu.utils.hf_import import model_spec
    from sav_tpu.utils.stacking import stack_layer_params
    from sav_tpu.utils.timm_import import convert_timm_vit

    blob = torch.load(args.pth_path, map_location='cpu',
                      weights_only=True)
    for envelope in ('model', 'state_dict', 'model_state_dict'):
        if envelope in blob and isinstance(blob[envelope], dict):
            blob = blob[envelope]
            break
    state_dict = {k: v.numpy() for k, v in blob.items()
                  if hasattr(v, 'numpy')}
    params, model_kwargs = convert_timm_vit(state_dict,
                                            num_heads=args.num_heads,
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
    print(f'wrote model spec to {spec_path} (native image size {img})')
    print('use it with any CLI, e.g.')
    print(f'  python predict.py -m {spec_path} -c {args.out_dir} '
          f'--images <glob> --img_size {img}')


if __name__ == '__main__':
    main()
