"""predict.py serving CLI: checkpoint restore without an optimizer
template, JPEG -> eval transform -> top-k JSON output."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from click.testing import CliRunner
from PIL import Image

from sav_tpu.models import create_model
from sav_tpu.train.checkpoint import CheckpointManager
from sav_tpu.train.state import TrainState, build_optimizer

IMG = 64


@pytest.fixture()
def tiny_checkpoint(tmp_path):
    """A real Orbax checkpoint written with a training-shaped optax chain
    (clip + schedule) that predict.py must NOT need to reconstruct."""
    model = create_model('vit_ti_patch16', num_classes=10)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, IMG, IMG, 3)), is_training=False)
    tx = build_optimizer(lambda i: 1e-3, weight_decay=1e-4, clip_grad=1.0)
    state = TrainState.create(variables, tx)
    ckpt = CheckpointManager(str(tmp_path / 'ck'))
    ckpt.save(7, state)
    ckpt.wait()
    ckpt.close()
    return tmp_path, variables


def test_restore_for_inference_needs_no_template(tiny_checkpoint):
    tmp_path, variables = tiny_checkpoint
    restored = CheckpointManager(str(tmp_path / 'ck')).restore_for_inference()
    assert int(restored['step']) == 0          # fresh state, saved at id 7
    assert restored['ema_params'] is None
    for a, b in zip(jax.tree_util.tree_leaves(variables['params']),
                    jax.tree_util.tree_leaves(restored['params'])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_predict_cli_end_to_end(tiny_checkpoint):
    tmp_path, _ = tiny_checkpoint
    img_dir = tmp_path / 'imgs'
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(3):
        arr = rng.randint(0, 256, (80, 96, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f'im{i}.jpg', quality=90)

    import predict
    out = CliRunner().invoke(predict.main, [
        '-m', 'vit_ti_patch16', '-c', str(tmp_path / 'ck'),
        '--images', str(img_dir), '--img_size', str(IMG),
        '-b', '2', '--top_k', '3', '--num_classes', '10',
        '--dtype', 'float32'])
    assert out.exit_code == 0, out.output
    rows = [json.loads(line) for line in out.output.splitlines()
            if line.startswith('{')]
    assert len(rows) == 3
    for row in rows:
        assert len(row['top_k']) == 3
        probs = [c['prob'] for c in row['top_k']]
        assert probs == sorted(probs, reverse=True)
        assert all(0.0 <= p <= 1.0 for p in probs)


def test_predict_cli_int8_ff_serving(tiny_checkpoint):
    """--quantized ff serves through the int8 FF kernel (interpret mode
    off-TPU) from the same bf16-trained checkpoint — param tree is
    unchanged, output stays a valid distribution."""
    tmp_path, _ = tiny_checkpoint
    img_dir = tmp_path / 'imgs8'
    img_dir.mkdir()
    arr = np.random.RandomState(1).randint(0, 256, (70, 70, 3), np.uint8)
    Image.fromarray(arr).save(img_dir / 'im.jpg', quality=90)

    import predict
    out = CliRunner().invoke(predict.main, [
        '-m', 'vit_ti_patch16', '-c', str(tmp_path / 'ck'),
        '--images', str(img_dir), '--img_size', str(IMG),
        '-b', '1', '--top_k', '3', '--num_classes', '10',
        '--dtype', 'float32', '--quantized', 'ff'])
    assert out.exit_code == 0, out.output
    rows = [json.loads(line) for line in out.output.splitlines()
            if line.startswith('{')]
    assert len(rows) == 1
    probs = [c['prob'] for c in rows[0]['top_k']]
    assert probs == sorted(probs, reverse=True)
    assert all(0.0 <= p <= 1.0 for p in probs)
