"""TfdsSource glue, tested against a fake ``tensorflow_datasets`` module.

tensorflow_datasets is not installed in this image, so the adapter around
``tfds.data_source`` (reference builds tf.data from ``tfds.builder``,
data/input_pipeline.py:109-117) is exercised by injecting a minimal fake
into ``sys.modules``: dict-of-splits with bytes-encoded, decoded-RGB,
and grayscale records. A real-TFDS run stays environment-gated
(``test_real_tfds_roundtrip``).
"""

import io
import pickle
import sys
import types

import numpy as np
import pytest

from sav_tpu.data import jpeg_source

IMG = 16
DECODE = max(int(round(IMG / 0.875)), IMG)   # == create_dataset's geometry


def _jpeg_bytes(arr):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format='JPEG', quality=95)
    return buf.getvalue()


def _records(kind, n=12):
    rng = np.random.RandomState(0)
    recs = []
    for i in range(n):
        arr = rng.randint(0, 255, (40, 60, 3), np.uint8)
        if kind == 'bytes':
            image = _jpeg_bytes(arr)
        elif kind == 'array':
            image = arr
        elif kind == 'gray2d':
            image = arr[..., 0]
        elif kind == 'gray3d':
            image = arr[..., :1]
        recs.append({'image': image, 'label': i % 3})
    return recs


class _FakeSplit:
    def __init__(self, records):
        self._records = records

    def __len__(self):
        return len(self._records)

    def __getitem__(self, i):
        return self._records[i]


def install_fake_tfds(monkeypatch, splits, record_calls=None):
    mod = types.ModuleType('tensorflow_datasets')

    def data_source(spec, split=None):
        if record_calls is not None:
            record_calls.append((spec, split))
        if split is not None:            # verbatim sub-split string
            name = split.split('[')[0]
            return _FakeSplit(splits[name][: len(splits[name]) // 2])
        return {k: _FakeSplit(v) for k, v in splits.items()}

    mod.data_source = data_source
    monkeypatch.setitem(sys.modules, 'tensorflow_datasets', mod)
    return mod


def test_bytes_branch_matches_decode_jpeg_fixed(monkeypatch):
    recs = _records('bytes')
    install_fake_tfds(monkeypatch, {'train': recs})
    src = jpeg_source.TfdsSource('fake', 'train', DECODE)
    assert len(src) == 12
    out = src[3]
    assert out['image'].shape == (DECODE, DECODE, 3)
    assert out['image'].dtype == np.uint8
    assert out['label'].dtype == np.int64
    expected = jpeg_source.decode_jpeg_fixed(io.BytesIO(recs[3]['image']),
                                             DECODE)
    np.testing.assert_array_equal(out['image'], expected)


@pytest.mark.parametrize('kind', ['array', 'gray2d', 'gray3d'])
def test_array_branch_matches_resize_center_crop(monkeypatch, kind):
    recs = _records(kind)
    install_fake_tfds(monkeypatch, {'train': recs})
    src = jpeg_source.TfdsSource('fake', 'train', DECODE)
    out = src[5]
    # grayscale records must still come back as a 3-channel frame
    # (ADVICE r2: (H,W) records broke batch collation)
    assert out['image'].shape == (DECODE, DECODE, 3)
    expected = jpeg_source.resize_center_crop_array(recs[5]['image'], DECODE)
    np.testing.assert_array_equal(out['image'], expected)


def test_eval_default_prefers_validation_then_test(monkeypatch):
    install_fake_tfds(monkeypatch, {'train': _records('array'),
                                    'validation': _records('array', 4),
                                    'test': _records('array', 6)})
    assert len(jpeg_source.TfdsSource('fake', None, DECODE)) == 4
    # datasets with only a 'test' split (cifar10, mnist) fall back to it
    install_fake_tfds(monkeypatch, {'train': _records('array'),
                                    'test': _records('array', 6)})
    assert len(jpeg_source.TfdsSource('fake', None, DECODE)) == 6


def test_unknown_split_raises_with_available_names(monkeypatch):
    install_fake_tfds(monkeypatch, {'train': _records('array')})
    with pytest.raises(ValueError, match="train"):
        jpeg_source.TfdsSource('fake', 'validation', DECODE)


def test_subsplit_string_routes_through_split_kwarg(monkeypatch):
    calls = []
    install_fake_tfds(monkeypatch, {'train': _records('array')},
                      record_calls=calls)
    src = jpeg_source.TfdsSource('fake', 'train[:50%]', DECODE)
    assert ('fake', 'train[:50%]') in calls
    assert len(src) == 6


def test_pickle_roundtrip_reopens_lazily(monkeypatch):
    """Grain workers pickle the source; the tfds handle must be dropped and
    reopened per process (ADVICE r2: the old function-local class could not
    be pickled at all)."""
    recs = _records('bytes')
    install_fake_tfds(monkeypatch, {'train': recs})
    src = jpeg_source.TfdsSource('fake', 'train', DECODE)
    clone = pickle.loads(pickle.dumps(src))
    assert clone._data is None, 'handle must not survive the pickle'
    np.testing.assert_array_equal(clone[2]['image'], src[2]['image'])
    assert len(clone) == len(src)


def test_create_dataset_tfds_end_to_end(monkeypatch):
    """'tfds:' routing through create_dataset + GrainDataset: train batches
    augment, eval batches are masked, ?split= wraps a SubsetSource."""
    from sav_tpu.data.pipeline import create_dataset

    install_fake_tfds(monkeypatch, {'train': _records('bytes', 16),
                                    'validation': _records('bytes', 6)})
    train = create_dataset('tfds:fake', batch_size=4, image_size=IMG,
                           num_classes=3, training=True,
                           augmentation='randaugment')
    batch = train.batch(0)
    assert batch['images'].shape == (4, IMG, IMG, 3)

    evald = create_dataset('tfds:fake', batch_size=4, image_size=IMG,
                           num_classes=3, training=False)
    assert evald.num_batches == 2           # ceil(6 / 4)
    b0 = evald.batch(0)
    assert b0['mask'].shape == (4,)

    half = create_dataset('tfds:fake?split=train[:50%]', batch_size=4,
                          image_size=IMG, num_classes=3, training=True)
    assert half.num_batches == 2            # 8 records // 4


def test_create_dataset_tfds_split_conflict_raises(monkeypatch):
    from sav_tpu.data.pipeline import create_dataset

    install_fake_tfds(monkeypatch, {'train': _records('array')})
    with pytest.raises(ValueError, match='split'):
        create_dataset('tfds:fake,train?split=train[:50%]', batch_size=4,
                       image_size=IMG, num_classes=3, training=True)


def _real_tfds_available() -> bool:
    try:
        import tensorflow_datasets  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _real_tfds_available(),
                    reason='real tensorflow_datasets not installed')
def test_real_tfds_roundtrip():     # pragma: no cover - environment-gated
    from sav_tpu.data.pipeline import create_dataset
    ds = create_dataset('tfds:mnist', batch_size=8, image_size=28,
                        num_classes=10, training=False)
    batch = ds.batch(0)
    assert batch['images'].shape == (8, 28, 28, 3)
