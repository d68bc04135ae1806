"""JPEG IO tier: folder/tar sources, fixed-shape draft decode, and the
create_dataset routing for real-image trees (reference capability:
data/input_pipeline.py:109-117's TFDS-backed JPEG pipeline)."""

import os
import subprocess
import sys
import tarfile

import numpy as np
import pytest

from sav_tpu.data import jpeg_source
from sav_tpu.data.pipeline import create_dataset

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope='module')
def jpeg_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('jpegs')
    subprocess.run(
        [sys.executable,
         os.path.join(REPO_ROOT, 'scripts', 'make_jpeg_dataset.py'),
         '--out', str(root), '--classes', '3', '--per-class', '6', '--tar'],
        check=True, env={**os.environ, 'PYTHONPATH': REPO_ROOT})
    return str(root)


def test_folder_source(jpeg_root):
    source = jpeg_source.JpegFolderSource(jpeg_root, decode_size=64)
    assert len(source) == 18
    assert source.class_names == ['class_0000', 'class_0001', 'class_0002']
    rec = source[7]     # class 1, second image
    assert rec['image'].shape == (64, 64, 3)
    assert rec['image'].dtype == np.uint8
    assert rec['label'] == 1
    # deterministic random access
    again = source[7]
    np.testing.assert_array_equal(rec['image'], again['image'])


def test_draft_decode_matches_geometry(jpeg_root):
    # portrait/landscape originals both come out square at decode_size
    source = jpeg_source.JpegFolderSource(jpeg_root, decode_size=96)
    for idx in (0, 5, 11, 17):
        assert source[idx]['image'].shape == (96, 96, 3)


def test_tar_source_matches_folder(jpeg_root):
    tar_path = os.path.join(jpeg_root, 'shards.tar')
    folder = jpeg_source.JpegFolderSource(jpeg_root, decode_size=64)
    tar = jpeg_source.JpegTarSource([tar_path], decode_size=64)
    assert len(tar) == len(folder)
    assert tar.class_names == folder.class_names
    rec_t, rec_f = tar[10], folder[10]
    assert rec_t['label'] == rec_f['label']
    np.testing.assert_array_equal(rec_t['image'], rec_f['image'])


def test_tar_source_picklable(jpeg_root):
    import pickle

    tar_path = os.path.join(jpeg_root, 'shards.tar')
    source = jpeg_source.JpegTarSource([tar_path], decode_size=64)
    _ = source[0]                      # open the fd
    clone = pickle.loads(pickle.dumps(source))
    np.testing.assert_array_equal(clone[3]['image'], source[3]['image'])


def test_create_dataset_routes_jpeg_folder(jpeg_root):
    ds = create_dataset(jpeg_root, batch_size=4, image_size=32,
                        augmentation='cutmix_mixup_randaugment_405',
                        training=True, seed=1)
    batch = ds.batch(0)
    assert batch['images'].shape == (4, 32, 32, 3)
    assert 'mix_labels' in batch and 'ratio' in batch
    # deterministic stream
    ds2 = create_dataset(jpeg_root, batch_size=4, image_size=32,
                         augmentation='cutmix_mixup_randaugment_405',
                         training=True, seed=1)
    np.testing.assert_allclose(np.asarray(batch['images']),
                               np.asarray(ds2.batch(0)['images']),
                               rtol=0, atol=0)


def test_create_dataset_routes_tar(jpeg_root):
    tar_path = os.path.join(jpeg_root, 'shards.tar')
    ds = create_dataset(tar_path, batch_size=4, image_size=32,
                        augmentation='none', training=False, seed=0)
    batch = ds.batch(0)
    assert batch['images'].shape == (4, 32, 32, 3)
    assert batch['mask'].shape == (4,)


def test_eval_padding_over_jpeg_folder(jpeg_root):
    # 18 images, batch 8 -> final eval batch is ragged and must be masked
    ds = create_dataset(jpeg_root, batch_size=8, image_size=32,
                        augmentation='none', training=False, seed=0)
    masks = [np.asarray(b['mask']) for b in ds]
    assert len(masks) == 3
    assert masks[0].sum() == 8 and masks[-1].sum() == 2
