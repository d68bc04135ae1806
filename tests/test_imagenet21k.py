"""ImageNet-21k-P tar conversion path (TFDS-free)."""

import io
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from sav_tpu.data import imagenet21k


@pytest.fixture()
def fake_tar(tmp_path):
    path = tmp_path / 'imagenet21k_train.tar'
    rng = np.random.RandomState(0)
    with tarfile.open(path, 'w') as archive:
        for cls in ('n001', 'n002'):
            for i in range(3):
                img = Image.fromarray(
                    rng.randint(0, 255, (30, 40, 3), dtype=np.uint8))
                buf = io.BytesIO()
                img.save(buf, format='JPEG')
                data = buf.getvalue()
                info = tarfile.TarInfo(f'train/{cls}/img_{i}.jpg')
                info.size = len(data)
                archive.addfile(info, io.BytesIO(data))
    return str(path)


def test_iter_tar_images(fake_tar):
    names = [name for name, _ in imagenet21k.iter_tar_images(fake_tar)]
    assert len(names) == 6
    assert all(name.endswith('.jpg') for name in names)


def test_prepare_npz_shards(fake_tar, tmp_path):
    out = tmp_path / 'shards'
    paths = imagenet21k.prepare_npz_shards(fake_tar, str(out), shard_size=4)
    assert len(paths) == 2   # 4 + 2
    first = np.load(paths[0])
    assert first['images'].shape == (4, 224, 224, 3)
    assert first['images'].dtype == np.uint8
    labels = np.concatenate([np.load(p)['labels'] for p in paths])
    assert set(labels.tolist()) == {0, 1}


def test_metadata_matches_reference():
    assert imagenet21k.NUM_CLASSES == 10450
    assert imagenet21k.TRAIN_IMAGES == 11060223
    assert imagenet21k.VALIDATION_IMAGES == 522500
