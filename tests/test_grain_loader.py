"""Grain host pipeline: shard writing, deterministic sharded loading,
on-device augmentation, and the create_dataset routing."""

import numpy as np
import pytest

from sav_tpu.data import grain_loader
from sav_tpu.data.pipeline import create_dataset


@pytest.fixture(scope='module')
def shard_dir(tmp_path_factory):
    rng = np.random.RandomState(0)
    images = rng.randint(0, 256, (64, 48, 48, 3), dtype=np.uint8)
    labels = rng.randint(0, 10, (64,))
    directory = tmp_path_factory.mktemp('shards')
    paths = grain_loader.write_npz_shards(images, labels,
                                          str(directory), shard_size=20)
    assert len(paths) == 4   # 20+20+20+4
    return str(directory)


def test_source_random_access(shard_dir):
    source = grain_loader.NpzShardSource(shard_dir + '/*.npz')
    assert len(source) == 64
    rec = source[25]   # second shard, local index 5
    assert rec['image'].shape == (48, 48, 3)
    assert rec['image'].dtype == np.uint8


@pytest.mark.skipif(not grain_loader.HAS_GRAIN, reason='grain missing')
def test_grain_dataset_deterministic(shard_dir):
    def make():
        return grain_loader.GrainDataset(
            shard_dir + '/*.npz', batch_size=8, image_size=32,
            augmentation='cutmix_mixup_randaugment_405', seed=3)

    a = make().batch(0)
    b = make().batch(0)
    assert a['images'].shape == (8, 32, 32, 3)
    np.testing.assert_array_equal(np.asarray(a['images']),
                                  np.asarray(b['images']))


@pytest.mark.skipif(not grain_loader.HAS_GRAIN, reason='grain missing')
def test_resume_via_iterator_state_without_replay(shard_dir, monkeypatch):
    """Restoring from get_state seeks in O(1) — no O(step) batch replay."""
    import grain.python as grain

    def make():
        return grain_loader.GrainDataset(
            shard_dir + '/*.npz', batch_size=4, image_size=32,
            augmentation='none', seed=5,
            read_options=grain.ReadOptions(num_threads=1,
                                           prefetch_buffer_size=4))

    first = make()
    for step in range(5):
        first.batch(step)
    saved = first.get_state()
    expected = np.asarray(first.batch(5)['labels'])

    resumed = make()
    resumed.set_state(saved)
    reads = []
    orig = grain_loader.NpzShardSource.__getitem__
    monkeypatch.setattr(grain_loader.NpzShardSource, '__getitem__',
                        lambda self, i: reads.append(i) or orig(self, i))
    got = np.asarray(resumed.batch(5)['labels'])
    np.testing.assert_array_equal(got, expected)
    # a few batches worth of source reads (batch + bounded prefetch), never
    # the >= 6 batches a replay-from-zero would cost
    assert len(reads) < 6 * 4, reads


@pytest.mark.skipif(not grain_loader.HAS_GRAIN, reason='grain missing')
def test_forward_skip_matches_fresh_stream(shard_dir):
    skipper = grain_loader.GrainDataset(shard_dir + '/*.npz', batch_size=4,
                                        image_size=32, augmentation='none',
                                        seed=5)
    skipper.batch(0)
    jumped = np.asarray(skipper.batch(3)['labels'])
    fresh = grain_loader.GrainDataset(shard_dir + '/*.npz', batch_size=4,
                                      image_size=32, augmentation='none',
                                      seed=5)
    for step in range(3):
        fresh.batch(step)
    np.testing.assert_array_equal(jumped,
                                  np.asarray(fresh.batch(3)['labels']))


@pytest.mark.skipif(not grain_loader.HAS_GRAIN, reason='grain missing')
def test_create_dataset_routes_to_grain(shard_dir):
    data = create_dataset(shard_dir, batch_size=4, image_size=32,
                          augmentation='none', training=False)
    batch = data.batch(0)
    assert batch['images'].shape == (4, 32, 32, 3)


@pytest.mark.skipif(not grain_loader.HAS_GRAIN, reason='grain missing')
def test_eval_pads_final_batch_with_mask(shard_dir):
    data = grain_loader.GrainDataset(shard_dir + '/*.npz', batch_size=48,
                                     image_size=32, training=False, seed=0)
    first = data.batch(0)
    assert first['images'].shape == (48, 32, 32, 3)
    assert float(np.asarray(first['mask']).sum()) == 48
    second = data.batch(1)
    assert second['images'].shape == (48, 32, 32, 3)
    assert float(np.asarray(second['mask']).sum()) == 16  # 64 - 48
    with pytest.raises(StopIteration):
        data.batch(2)
