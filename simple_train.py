"""Minimal hard-coded training entry point (reference: simple_train.py).

Runs a short ViT training on synthetic data with no arguments — the
CPU-runnable end-to-end smoke slice (BASELINE.md tracked config #1). On a
real TPU it runs the same loop at full batch size.
"""

import jax

from sav_tpu.train import TrainConfig, Trainer


def main():
    on_tpu = jax.default_backend() == 'tpu'
    config = TrainConfig(
        model_name='vit_s_patch16',
        img_size=224,
        batch_size=256 if on_tpu else 8,
        total_steps=50 if on_tpu else 3,
        dtype='bfloat16' if on_tpu else 'float32',
        label_smoothing=0.1,
        lr=3e-3,
        weight_decay=1e-4,
        clip_grad=1.0,
        steps_per_dispatch=10 if on_tpu else 1,
        log_every=1,
        eval_every_epochs=10**6,        # skip eval in the smoke loop
        checkpoint_every_epochs=10**6,
        seed=42,
    )
    metrics = Trainer(config).run()
    print('final metrics:', metrics)


if __name__ == '__main__':
    main()
