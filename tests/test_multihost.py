"""Real multi-host validation: a 2-process CPU cluster (VERDICT r2 #4).

Spawns two worker processes that join one JAX cluster via
``jax.distributed.initialize`` (through the library's own env-driven
``maybe_initialize_distributed``), each with 4 virtual CPU devices — the
same multi-controller SPMD shape as a 2-slice TPU pod, with gRPC standing
in for DCN. The workers build the hybrid DCN-major mesh, run sharded train
steps on a global batch, and round-trip an Orbax checkpoint; the parent
asserts both controllers saw identical replicated losses and that those
losses match a single-process 8-device run of the same math (the
reference's designed-for multi-host surface: per-host data splits +
process_index gating, data/input_pipeline.py:113-122).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO_ROOT, 'tests', 'multihost_child.py')


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _spawn(process_id: int, port: int, ckpt_dir: str):
    env = {k: v for k, v in os.environ.items()
           if k not in ('PYTHONPATH', 'XLA_FLAGS', 'JAX_PLATFORMS')}
    env.update({
        'PYTHONPATH': REPO_ROOT,                  # scrub the axon site hook
        'PALLAS_AXON_POOL_IPS': '',
        'JAX_PLATFORMS': 'cpu',
        'XLA_FLAGS': '--xla_force_host_platform_device_count=4',
        'JAX_COORDINATOR_ADDRESS': f'localhost:{port}',
        'JAX_NUM_PROCESSES': '2',
        'JAX_PROCESS_ID': str(process_id),
    })
    return subprocess.Popen([sys.executable, CHILD, ckpt_dir], env=env,
                            cwd=REPO_ROOT, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)


def _single_process_losses():
    """The same training math on this process's own 8-device mesh."""
    import jax
    import jax.numpy as jnp

    from sav_tpu.data.synthetic import SyntheticDataset
    from sav_tpu.models import ViT
    from sav_tpu.parallel.mesh import create_mesh
    from sav_tpu.train import steps as steps_lib
    from sav_tpu.train.state import TrainState, build_optimizer

    mesh = create_mesh()
    num_classes, img, batch = 8, 32, 16
    model = ViT(num_classes=num_classes, num_layers=2, num_heads=4,
                embed_dim=64, patch_shape=(16, 16), dtype=jnp.float32)
    tx = build_optimizer(1e-3, weight_decay=1e-4, clip_grad=1.0)
    variables = jax.jit(model.init, static_argnames='is_training')(
        jax.random.PRNGKey(0), jnp.ones((1, img, img, 3)),
        is_training=False)
    state = steps_lib.shard_state(mesh, TrainState.create(variables, tx))
    data = SyntheticDataset(batch, img, num_classes=num_classes, mesh=mesh)
    step_fn = steps_lib.make_train_step(model, tx, mesh, state,
                                        num_classes=num_classes,
                                        label_smoothing=0.1, donate=False)
    rng = jax.random.PRNGKey(1)
    losses = []
    for step in range(3):
        state, metrics = step_fn(state, data.batch(step), rng)
        losses.append(float(jax.device_get(metrics['loss'])))
    return losses


def test_two_process_cluster_matches_single_process(tmp_path):
    port = _free_port()
    ckpt_dir = str(tmp_path / 'ckpt')
    workers = [_spawn(i, port, ckpt_dir) for i in range(2)]
    outputs = []
    try:
        for w in workers:
            out, _ = w.communicate(timeout=480)
            outputs.append(out)
    finally:
        for w in workers:
            if w.poll() is None:
                w.kill()

    results = {}
    for out, w in zip(outputs, workers):
        assert w.returncode == 0, f'worker failed:\n{out[-4000:]}'
        lines = [l for l in out.splitlines() if l.startswith('RESULT ')]
        assert lines, f'no RESULT line:\n{out[-4000:]}'
        payload = json.loads(lines[-1][len('RESULT '):])
        results[payload['process']] = payload

    assert set(results) == {0, 1}
    # the hybrid mesh really formed: 8 global devices, DCN-major data axis
    assert results[0]['mesh'] == {'data': 8, 'model': 1}
    # both controllers observed the same replicated loss stream
    assert results[0]['losses'] == results[1]['losses']
    assert len(results[0]['losses']) == 3
    # and the distributed run computes the same math as single-process
    np.testing.assert_allclose(results[0]['losses'],
                               _single_process_losses(), rtol=2e-5)
    # the checkpoint was actually written (shared fs, both processes)
    assert os.path.isdir(os.path.join(ckpt_dir, '2'))
