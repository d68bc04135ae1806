"""Deterministic synthetic data source.

Covers the reference pipeline's ``fake_data`` capability (the phantom API's
``fake_data=False`` flag, reference: train.py:58) and serves as the
CPU-runnable end-to-end slice: batches are generated *on device* from a
seed folded with the step index, so the stream is reproducible under any
sharding and costs no host->device transfer.
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sav_tpu.parallel.mesh import DATA_AXIS


def synthetic_batch(rng: jax.Array, batch_size: int, image_size: int,
                    num_classes: int, channels: int = 3):
    """One deterministic batch {'images', 'labels'}."""
    image_rng, label_rng = jax.random.split(rng)
    images = jax.random.uniform(
        image_rng, (batch_size, image_size, image_size, channels),
        dtype=jnp.float32)
    labels = jax.random.randint(label_rng, (batch_size,), 0, num_classes,
                                dtype=jnp.int32)
    return {'images': images, 'labels': labels}


class SyntheticDataset:
    """Infinite iterator of mesh-sharded synthetic batches."""

    def __init__(self, batch_size: int, image_size: int,
                 num_classes: int = 1000, seed: int = 0,
                 mesh: Optional[Mesh] = None):
        self.batch_size = batch_size
        self.image_size = image_size
        self.num_classes = num_classes
        self._base_rng = jax.random.PRNGKey(seed)

        out_shardings = None
        if mesh is not None:
            out_shardings = {'images': NamedSharding(mesh, P(DATA_AXIS)),
                             'labels': NamedSharding(mesh, P(DATA_AXIS))}
        self._make = jax.jit(
            functools.partial(synthetic_batch,
                              batch_size=batch_size,
                              image_size=image_size,
                              num_classes=num_classes),
            out_shardings=out_shardings)

    def batch(self, step: int):
        return self._make(jax.random.fold_in(self._base_rng, step))

    def __iter__(self) -> Iterator:
        step = 0
        while True:
            yield self.batch(step)
            step += 1


def device_batch_fn(batch_size: int, image_size: int, num_classes: int,
                    seed: int = 0):
    """Traceable ``batch_fn(step) -> batch`` for chained train steps."""
    base_rng = jax.random.PRNGKey(seed)

    def batch_fn(step):
        return synthetic_batch(jax.random.fold_in(base_rng, step),
                               batch_size, image_size, num_classes)

    return batch_fn
