"""Worker process for the real 2-process CPU-cluster test.

Launched by tests/test_multihost.py with cluster membership in the
environment (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)
and 4 virtual CPU devices per process. Joins the cluster through the
library's own ``maybe_initialize_distributed`` (not a test shim), builds
the hybrid DCN-major mesh, runs sharded train steps, round-trips an Orbax
checkpoint, and prints a RESULT json line for the parent to compare.
"""

import json
import sys


def main(ckpt_dir: str) -> None:
    # must run before any backend-touching JAX call
    from sav_tpu.parallel.mesh import (create_mesh,
                                       maybe_initialize_distributed)
    maybe_initialize_distributed()

    import jax
    import jax.numpy as jnp

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, jax.devices()
    assert jax.local_device_count() == 4

    from sav_tpu.data.synthetic import SyntheticDataset
    from sav_tpu.models import ViT
    from sav_tpu.train import steps as steps_lib
    from sav_tpu.train.checkpoint import CheckpointManager
    from sav_tpu.train.state import TrainState, build_optimizer

    mesh = create_mesh(hybrid=True)
    num_classes, img, batch = 8, 32, 16
    model = ViT(num_classes=num_classes, num_layers=2, num_heads=4,
                embed_dim=64, patch_shape=(16, 16), dtype=jnp.float32)
    tx = build_optimizer(1e-3, weight_decay=1e-4, clip_grad=1.0)

    def fresh_state():
        variables = jax.jit(model.init, static_argnames='is_training')(
            jax.random.PRNGKey(0), jnp.ones((1, img, img, 3)),
            is_training=False)
        return steps_lib.shard_state(mesh,
                                     TrainState.create(variables, tx))

    state = fresh_state()
    data = SyntheticDataset(batch, img, num_classes=num_classes, mesh=mesh)
    train_step = steps_lib.make_train_step(model, tx, mesh, state,
                                           num_classes=num_classes,
                                           label_smoothing=0.1,
                                           donate=False)
    rng = jax.random.PRNGKey(1)

    losses = []
    for step in range(2):
        state, metrics = train_step(state, data.batch(step), rng)
        losses.append(float(jax.device_get(metrics['loss'])))

    ckpt = CheckpointManager(ckpt_dir)
    ckpt.save(2, state)
    ckpt.wait()

    restored = ckpt.restore(fresh_state())
    assert int(jax.device_get(restored.step)) == 2
    restored, metrics = train_step(restored, data.batch(2), rng)
    losses.append(float(jax.device_get(metrics['loss'])))

    print('RESULT ' + json.dumps({
        'process': jax.process_index(),
        'mesh': {k: int(v) for k, v in mesh.shape.items()},
        'losses': losses,
    }), flush=True)


if __name__ == '__main__':
    main(sys.argv[1])
