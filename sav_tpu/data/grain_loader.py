"""Grain-backed host input pipeline for real datasets.

TPU-native replacement for the reference's clu/tf.data orchestration
(reference: data/input_pipeline.py:253-379): Grain provides the
deterministic, per-host-sharded, prefetching host loop (the role
``clu.deterministic_data`` + the 48-thread tf.data pool played), and all
augmentation runs on device via ``sav_tpu.data.pipeline`` — the host only
reads raw records and collates uint8 arrays.

Storage format: directories of ``.npz`` shards with uint8 ``images``
[N, H, W, C] and int ``labels`` [N] (what you get from exporting
TFDS/webdataset to numpy). Per-host sharding mirrors the reference's
``get_read_instruction_for_host`` split (input_pipeline.py:109-122).
"""

from __future__ import annotations

import glob
import os
from typing import Sequence

import jax
import numpy as np

try:
    import grain.python as grain
    HAS_GRAIN = True
except ImportError:      # pragma: no cover - grain is in the image
    HAS_GRAIN = False

from sav_tpu.data.pipeline import make_train_augment_fn, parse_augment_name
from sav_tpu.data import preprocess
from sav_tpu.parallel.mesh import DATA_AXIS


class NpzShardSource:
    """Random-access Grain data source over a directory of .npz shards.

    Shard files are opened lazily per process: Grain's worker pool pickles
    the source, and open NpzFile handles (BufferedReader) cannot cross the
    pickle boundary. Only sizes are read at construction.
    """

    def __init__(self, pattern: str):
        self._pattern = pattern
        self._paths: Sequence[str] = sorted(glob.glob(pattern))
        if not self._paths:
            raise FileNotFoundError(f'no shards match {pattern!r}')
        sizes = []
        for path in self._paths:
            with np.load(path) as data:
                sizes.append(data['labels'].shape[0])
        self._offsets = np.cumsum([0] + sizes)
        self._shards = [None] * len(self._paths)

    def __repr__(self) -> str:
        # stable across instances: Grain validates checkpointed iterator
        # state against repr(data_source)
        return f'NpzShardSource({self._pattern!r}, n={len(self)})'

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def _shard(self, index: int):
        data = self._shards[index]
        if data is None:
            # benign race under threaded readers: both load, one is kept
            data = np.load(self._paths[index], mmap_mode=None)
            self._shards[index] = data
        return data

    def __getitem__(self, index: int):
        shard = int(np.searchsorted(self._offsets, index, side='right') - 1)
        local = index - self._offsets[shard]
        data = self._shard(shard)
        return {'image': data['images'][local], 'label': data['labels'][local]}

    def __getstate__(self):
        state = dict(self.__dict__)
        state['_shards'] = [None] * len(self._paths)  # handles don't pickle
        return state


class SubsetSource:
    """Deterministic train/eval partition of any random-access source.

    Selects a contiguous slice of a *fixed* pseudorandom permutation of the
    source's indices, so ``[:90%]`` and ``[90%:]`` of the same source are
    disjoint by construction and class-balanced in expectation (a plain
    index slice of a class-sorted JPEG tree would drop whole classes). The
    permutation seed is a constant, independent of the training seed: both
    sides of a split must agree on it, across processes and restarts.

    This is the split-discipline layer the reference got from reading
    distinct TFDS splits per host (reference: data/input_pipeline.py:
    109-122): there, train and eval were different dataset splits; here any
    single source can be partitioned with the same guarantee.
    """

    _PERM_SEED = 0x5A5F  # fixed by contract — do not derive from user seed

    def __init__(self, source, lo: float, hi: float):
        if not 0.0 <= lo < hi <= 1.0:
            raise ValueError(f'split range [{lo}:{hi}] must satisfy '
                             f'0 <= lo < hi <= 1')
        self._source = source
        self._lo, self._hi = float(lo), float(hi)
        n = len(source)
        self._start = int(round(lo * n))
        self._stop = int(round(hi * n))
        if self._stop <= self._start:
            raise ValueError(
                f'split [{lo}:{hi}] of a {n}-example source is empty')
        self._perm = None
        if hasattr(source, 'class_names'):
            self.class_names = source.class_names

    def _indices(self) -> np.ndarray:
        if self._perm is None:      # lazy: recomputed per pickled worker
            perm = np.random.RandomState(self._PERM_SEED).permutation(
                len(self._source))
            self._perm = perm[self._start:self._stop]
        return self._perm

    def __repr__(self) -> str:
        return (f'SubsetSource({self._source!r}, '
                f'[{self._lo:g}:{self._hi:g}])')

    def __len__(self) -> int:
        return self._stop - self._start

    def __getitem__(self, index: int):
        return self._source[int(self._indices()[index])]

    def __getstate__(self):
        state = dict(self.__dict__)
        state['_perm'] = None       # cheap to recompute; keep pickles small
        return state


class GrainDataset:
    """Deterministic, sharded Grain loader + on-device augmentation.

    ``batch(step)`` is index-addressable like the other dataset classes so
    the training loop and eval padding logic stay source-agnostic.
    """

    def __init__(self, source, batch_size: int, image_size: int,
                 augmentation: str = 'none', training: bool = True,
                 seed: int = 0, mesh=None, num_workers: int = 0,
                 read_options=None):
        if not HAS_GRAIN:
            raise ImportError('grain is required for GrainDataset')
        self.batch_size = batch_size
        if isinstance(source, str):
            source = NpzShardSource(source)
        # finite batch count for this host's shard (eval keeps the ragged
        # tail batch; Trainer.evaluate walks exactly this many batches to
        # cover the full split, reference: input_pipeline.py:360-376)
        per_host = len(source) // jax.process_count()
        self.num_batches = (per_host // batch_size if training
                            else -(-per_host // batch_size))

        shard_options = grain.ShardOptions(
            shard_index=jax.process_index(),
            shard_count=jax.process_count(),
            drop_remainder=True)
        sampler = grain.IndexSampler(
            num_records=len(source),
            shard_options=shard_options,
            shuffle=training,
            num_epochs=None if training else 1,
            seed=seed)
        self._loader = grain.DataLoader(
            data_source=source,
            sampler=sampler,
            operations=[grain.Batch(batch_size=batch_size,
                                    drop_remainder=training)],
            worker_count=num_workers,
            read_options=read_options)
        self._iterator = iter(self._loader)
        self._next_step = 0

        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        config = parse_augment_name(augmentation)
        augment_fn = make_train_augment_fn(image_size, config)

        def device_transform(rng, images, labels, mask):
            images = images.astype(jnp.float32)
            if training:
                return augment_fn(rng, images, labels)
            out = jax.vmap(
                lambda im: preprocess.eval_preprocess(im, image_size))(images)
            return {'images': out, 'labels': labels, 'mask': mask}

        shardings = None
        if mesh is not None:
            shardings = NamedSharding(mesh, P(DATA_AXIS))
        self._transform = jax.jit(device_transform, out_shardings=shardings)
        self._rng = jax.random.PRNGKey(seed)
        self._training = training

    def get_state(self) -> bytes:
        """Serialized loader position for checkpoint/resume (wraps Grain's
        native iterator state, so restoring is O(1), not an O(step) replay)."""
        import base64
        import json
        return json.dumps({
            'grain': base64.b64encode(self._iterator.get_state()).decode(),
            'next_step': self._next_step,
        }).encode()

    def set_state(self, state: bytes) -> None:
        import base64
        import json
        payload = json.loads(state.decode())
        self._iterator.set_state(base64.b64decode(payload['grain']))
        self._next_step = int(payload['next_step'])

    def batch(self, step: int):
        if step != self._next_step:   # out-of-order access
            if step > self._next_step:
                skip = step - self._next_step   # forward: O(delta) skip
            else:
                self._iterator = iter(self._loader)   # backward: replay
                skip = step
            for _ in range(skip):
                next(self._iterator)
        record = next(self._iterator)
        self._next_step = step + 1
        images = np.ascontiguousarray(record['image'])
        labels = np.ascontiguousarray(record['label'])
        # pad ragged final eval batches to keep jit shapes static; the mask
        # tells eval_step which rows are real (reference: the tf.data
        # pipeline's pad_up_to_batches, input_pipeline.py:360-376)
        valid = images.shape[0]
        mask = np.ones((self.batch_size,), np.float32)
        if valid < self.batch_size:
            pad = self.batch_size - valid
            images = np.concatenate(
                [images, np.zeros((pad,) + images.shape[1:], images.dtype)])
            labels = np.concatenate([labels, np.zeros((pad,), labels.dtype)])
            mask[valid:] = 0.0
        return self._transform(jax.random.fold_in(self._rng, step),
                               images, labels, mask)

    def __iter__(self):
        step = 0
        while True:
            try:
                yield self.batch(step)
            except StopIteration:
                return
            step += 1


def write_npz_shards(images: np.ndarray, labels: np.ndarray,
                     directory: str, shard_size: int = 10000,
                     prefix: str = 'shard') -> list:
    """Utility: export arrays to the shard format GrainDataset reads."""
    os.makedirs(directory, exist_ok=True)
    paths = []
    for i in range(0, len(labels), shard_size):
        path = os.path.join(directory,
                            f'{prefix}-{i // shard_size:05d}.npz')
        np.savez(path, images=images[i:i + shard_size],
                 labels=labels[i:i + shard_size])
        paths.append(path)
    return paths
