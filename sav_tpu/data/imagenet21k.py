"""ImageNet-21k-P (winter release) dataset definition.

Covers the reference's custom TFDS builder
(reference: data/custom_datasets/imagenet_21k_p_winter.py:26-100): the
processed winter-21 release with 10,450 classes, 11,060,223 train and
522,500 validation images, stored as 224x224 jpegs in per-split tars.

Two access paths:
  * ``Imagenet21kPWinter`` — the TFDS GeneratorBasedBuilder, defined when
    tensorflow_datasets is installed (it is not part of this image, so the
    class is gated).
  * ``prepare_npz_shards`` — tar -> .npz shard converter feeding
    ``sav_tpu.data.grain_loader.GrainDataset``, the TPU-native path.
"""

from __future__ import annotations

import io
import os
import tarfile

import numpy as np

NUM_CLASSES = 10_450
TRAIN_IMAGES = 11_060_223
VALIDATION_IMAGES = 522_500
IMAGE_SIZE = 224

_DESCRIPTION = ('ImageNet-21K-P winter-21 release, preprocessed to '
                f'{IMAGE_SIZE}x{IMAGE_SIZE}. Manual download required '
                '(the tars are not publicly redistributable).')

try:
    import tensorflow_datasets as tfds

    class Imagenet21kPWinter(tfds.core.GeneratorBasedBuilder):
        """TFDS builder (requires manually downloaded winter-21 tars)."""

        VERSION = tfds.core.Version('1.0.0')
        MANUAL_DOWNLOAD_INSTRUCTIONS = _DESCRIPTION

        def _info(self):
            return tfds.core.DatasetInfo(
                builder=self,
                description=_DESCRIPTION,
                features=tfds.features.FeaturesDict({
                    'image': tfds.features.Image(
                        shape=(IMAGE_SIZE, IMAGE_SIZE, 3),
                        encoding_format='jpeg'),
                    'label': tfds.features.ClassLabel(
                        num_classes=NUM_CLASSES),
                }),
                supervised_keys=('image', 'label'),
            )

        def _split_generators(self, dl_manager):
            base = dl_manager.manual_dir
            return {
                'train': self._generate_examples(
                    os.path.join(base, 'imagenet21k_train.tar')),
                'validation': self._generate_examples(
                    os.path.join(base, 'imagenet21k_val.tar')),
            }

        def _generate_examples(self, archive_path):
            for name, handle in iter_tar_images(archive_path):
                label = name.split('/')[-2]
                yield name, {'image': handle, 'label': label}

except ImportError:
    Imagenet21kPWinter = None


def iter_tar_images(archive_path: str):
    """Streams (member_name, fileobj) for every jpeg in a tar archive."""
    with tarfile.open(archive_path) as archive:
        for member in archive:
            if not member.isfile():
                continue
            if not member.name.lower().endswith(('.jpg', '.jpeg')):
                continue
            yield member.name, archive.extractfile(member)


def prepare_npz_shards(archive_path: str, out_dir: str,
                       shard_size: int = 10_000,
                       class_names=None) -> list:
    """Converts a winter-21 tar into Grain-readable .npz shards.

    Decoding uses PIL on the host once, offline; training then never
    touches jpeg decode again (the reference re-decoded every epoch on the
    tf.data path).
    """
    from PIL import Image

    label_of = {}
    images, labels, paths = [], [], []
    os.makedirs(out_dir, exist_ok=True)
    shard_idx = 0

    def flush():
        nonlocal images, labels, shard_idx
        if not images:
            return
        path = os.path.join(out_dir, f'shard-{shard_idx:05d}.npz')
        np.savez(path, images=np.stack(images),
                 labels=np.asarray(labels, np.int64))
        paths.append(path)
        shard_idx += 1
        images, labels = [], []

    for name, handle in iter_tar_images(archive_path):
        class_name = name.split('/')[-2]
        if class_names is not None:
            label = class_names.index(class_name)
        else:
            label = label_of.setdefault(class_name, len(label_of))
        with Image.open(io.BytesIO(handle.read())) as img:
            img = img.convert('RGB').resize((IMAGE_SIZE, IMAGE_SIZE))
            images.append(np.asarray(img, np.uint8))
        labels.append(label)
        if len(images) >= shard_size:
            flush()
    flush()
    return paths
