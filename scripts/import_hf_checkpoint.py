"""Convert a HuggingFace-transformers ViT checkpoint to sav_tpu.

Loads a local `ViTForImageClassification` checkpoint directory (config.json
plus model.safetensors / pytorch_model.bin), converts the weights with
``sav_tpu.utils.hf_import.convert_hf_vit`` (exact: transposes + the
patch-bias -> pos-embed fold), and writes a sav_tpu Orbax checkpoint that
``Trainer`` / ``evaluate.py`` / ``predict.py`` restore from.

HF architectures usually sit outside the 29-name factory registry (q/k/v/
out biases, exact-erf gelu, arbitrary dims), so the tool also writes a
``model.json`` spec into OUT_DIR; every CLI accepts it as the model name
(``-m OUT_DIR/model.json``) and constructs the matching architecture.

Usage:
  python scripts/import_hf_checkpoint.py HF_CKPT_DIR OUT_DIR \
      [--scan-layers] [--ema]
"""

import argparse
import sys

sys.path.insert(0, '.')


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('hf_dir', help='local HF checkpoint directory')
    parser.add_argument('out_dir')
    parser.add_argument('--scan-layers', action='store_true')
    # must match the flags of the run that restores (see
    # convert_reference_checkpoint.py for why: Orbax restores into an
    # exact optimizer-state template)
    parser.add_argument('--weight-decay', type=float, default=1e-4)
    parser.add_argument('--clip-grad', type=float, default=None)
    parser.add_argument('--mu-dtype', default=None)
    parser.add_argument('--ema', action='store_true')
    parser.add_argument('--num-classes', type=int, default=1000,
                        help='head width for headless (ViTModel, e.g. '
                             'in21k) checkpoints; zero-init head')
    args = parser.parse_args()

    import json
    import os

    import transformers

    from sav_tpu.train.checkpoint import CheckpointManager
    from sav_tpu.train.state import TrainState, build_optimizer
    from sav_tpu.utils.hf_import import convert_hf_vit, model_spec
    from sav_tpu.utils.stacking import stack_layer_params

    cfg = transformers.ViTConfig.from_pretrained(args.hf_dir)
    if 'ViTForImageClassification' in (cfg.architectures or []):
        hf = transformers.ViTForImageClassification.from_pretrained(
            args.hf_dir)
    else:
        # headless checkpoint (ViTModel, e.g. the in21k pretrains): loading
        # it through ViTForImageClassification would inject a RANDOM
        # classifier; load the bare trunk and let the converter zero-init
        # the head instead (the fine-tune-ready start)
        hf = transformers.ViTModel.from_pretrained(args.hf_dir,
                                                   add_pooling_layer=False)
    state_dict = {k: v.numpy() for k, v in hf.state_dict().items()}
    params, model_kwargs = convert_hf_vit(state_dict, hf.config,
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
    print(f'wrote sav_tpu checkpoint to {args.out_dir}')
    print(f'wrote model spec to {spec_path}')
    print('use it with any CLI, e.g.')
    print(f'  python evaluate.py -m {spec_path} -c {args.out_dir} '
          '--data_dir <eval data>')
    print(f'  python predict.py -m {spec_path} -c {args.out_dir} '
          '--images <glob>')


if __name__ == '__main__':
    main()
