"""Deterministic, mesh-sharded input pipeline with on-device augmentation.

TPU-native replacement for the reference's ``create_datasets`` tf.data
orchestration (reference: data/input_pipeline.py:74-379): instead of a
48-thread host CPU pool running TF augment kernels, the full augmentation
graph — random resized crop, flip, RandAugment, normalize, random erasing,
then batch-level mixup/cutmix — is one jit-compiled, vmapped function of
``(seed, step)`` running on the accelerator. Determinism comes from
``jax.random.fold_in(seed, step)`` (replacing TF's stateless_fold_in scheme,
input_pipeline.py:39-71): same seed -> same batch stream, independent of
host threading.

Sources are pluggable: 'synthetic' generates data on device; an in-memory
uint8 array source covers CIFAR-scale real data. TFDS-backed ImageNet IO is
gated on tensorflow_datasets being installed.

The reference's augment-name strings ('cutmix_mixup_randaugment_405',
train.py:159 / simple_train.py:50) come from the DeepMind-NFNets input API
the train scripts imitate (the orphaned autoaugment.py exposes its
``distort_image_with_randaugment(image, num_layers, magnitude)``), where the
digits after ``randaugment_`` read as <num_layers><magnitude...>: '405' is
4 layers at fixed magnitude 5. A bare ``randaugment`` token instead takes
the reference's *working* pipeline defaults (data/input_pipeline.py:78-85:
2 layers, magnitude 9, magstd 0.5, per-layer prob 0.5). ``colorjitter``
(optionally ``colorjitter_<strength>``) composes SimCLR color jitter after
RandAugment, as the reference's train preprocess does
(data/preprocess/preprocess.py:161-186, strength default 0.3 per
input_pipeline.py:96).
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sav_tpu.data import image_ops, mix, preprocess
from sav_tpu.data.randaugment import RandAugment
from sav_tpu.parallel.mesh import DATA_AXIS


_SPLIT_FMT = re.compile(
    r'(?P<name>[A-Za-z_]\w*)?'
    r'(?:\[(?P<lo>\d+(?:\.\d+)?)?\s*%?:(?P<hi>\d+(?:\.\d+)?)?\s*%?\])?')


def parse_split_fractions(spec: str):
    """Parses a TFDS-style split spec into ``(name, lo, hi)`` fractions.

    ``'train[:90%]' -> ('train', 0.0, 0.9)``; ``'train[90%:]' ->
    ('train', 0.9, 1.0)``; ``'validation' -> ('validation', 0.0, 1.0)``;
    a bare range ``'[5%:15%]'`` defaults the name to 'train'. For ``tfds:``
    sources the name selects the TFDS split; for every other source the name
    is cosmetic and the fractions select a deterministic permutation slice
    (see ``grain_loader.SubsetSource``).
    """
    m = _SPLIT_FMT.fullmatch(spec.strip())
    if not m or not m.group(0):
        raise ValueError(
            f'bad split spec {spec!r}; expected e.g. train, train[:90%], '
            f'train[90%:], [5%:15%]')
    name = m.group('name') or 'train'
    lo = float(m.group('lo')) / 100.0 if m.group('lo') else 0.0
    hi = float(m.group('hi')) / 100.0 if m.group('hi') else 1.0
    if not 0.0 <= lo < hi <= 1.0:
        raise ValueError(f'split range in {spec!r} is empty or out of order')
    return name, lo, hi


def parse_dataset_spec(name: str):
    """Splits a dataset name from its optional ``?split=`` suffix.

    ``'dir?split=train[:90%]' -> ('dir', ('train', 0.0, 0.9))``;
    no suffix -> ``(name, None)``.
    """
    if '?split=' not in name:
        return name, None
    base, _, spec = name.rpartition('?split=')
    return base, parse_split_fractions(spec)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    use_mix: bool = True
    mix_prob: float = 1.0
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    use_randaugment: bool = True
    magnitude: Optional[float] = 9.0    # RandAugment LEVEL units [0, 10]
    magstd: Optional[float] = 0.5
    num_layers: int = 2
    ra_prob: Optional[float] = 0.5      # per-layer apply probability
    ra_cutout: bool = False             # trailing cutout (ref default: off)
    use_colorjitter: bool = False
    colorjitter_strength: float = 0.3
    erase_prob: float = 0.25


def parse_augment_name(name: str, default=AugmentConfig()) -> AugmentConfig:
    """Parses the reference's augmentation-strategy strings (grammar in the
    module docstring)."""
    if not name or name == 'none':
        return AugmentConfig(use_mix=False, use_randaugment=False,
                             use_colorjitter=False, erase_prob=0.0)
    use_mix = 'mixup' in name or 'cutmix' in name
    mix_prob = 1.0
    prob_match = re.search(r'(?:cutmix_)?mixup_(\d*\.\d+)', name)
    if prob_match:
        mix_prob = float(prob_match.group(1))

    use_ra = 'randaugment' in name
    magnitude, magstd = default.magnitude, default.magstd
    num_layers, ra_prob = default.num_layers, default.ra_prob
    ra_match = re.search(r'randaugment_(\d)(\d+)', name)
    if ra_match:
        # NFNets grammar: first digit = layers, rest = fixed magnitude
        # ('randaugment_405' = 4 layers, magnitude 5; no std, no layer prob).
        num_layers = int(ra_match.group(1))
        magnitude = float(int(ra_match.group(2)))
        magstd = None
        ra_prob = None

    use_jitter = 'colorjitter' in name
    strength = default.colorjitter_strength
    jitter_match = re.search(r'colorjitter_(\d*\.\d+)', name)
    if jitter_match:
        strength = float(jitter_match.group(1))

    return AugmentConfig(use_mix=use_mix, mix_prob=mix_prob,
                         use_randaugment=use_ra, magnitude=magnitude,
                         magstd=magstd, num_layers=num_layers,
                         ra_prob=ra_prob, use_colorjitter=use_jitter,
                         colorjitter_strength=strength)


def make_train_augment_fn(image_size: int, config: AugmentConfig):
    """Builds the fused per-batch augmentation fn: (rng, images, labels) ->
    batch dict. ``images`` are decoded uint8/float [B, H, W, C] in [0,255]."""
    randaugment = RandAugment(
        num_layers=config.num_layers,
        magnitude=config.magnitude,
        magstd=config.magstd,
        prob_to_apply=config.ra_prob,
        cutout=config.ra_cutout,
        num_levels=10,
        size=image_size) if config.use_randaugment else None

    def per_example(rng, image):
        r_crop, r_aug, r_jitter, r_erase = jax.random.split(rng, 4)
        image = preprocess.train_preprocess(r_crop, image, image_size)
        if randaugment is not None:
            image = randaugment(r_aug, image)
        if config.use_colorjitter:
            # composed after RandAugment, before normalization, matching the
            # reference's order (preprocess.py:161-186)
            from sav_tpu.data import color
            image = color.color_jitter(r_jitter, image,
                                       strength=config.colorjitter_strength)
        image = preprocess.normalize(image)
        if config.erase_prob:
            image = image_ops.random_erasing(image, r_erase,
                                             erase_prob=config.erase_prob)
        return image

    def augment(rng, images, labels):
        images = images.astype(jnp.float32)
        rng_mix, rng_examples = jax.random.split(rng)
        example_rngs = jax.random.split(rng_examples, images.shape[0])
        images = jax.vmap(per_example)(example_rngs, images)
        if config.use_mix:
            return mix.mix_augment(rng_mix, images, labels,
                                   mixup_alpha=config.mixup_alpha,
                                   cutmix_alpha=config.cutmix_alpha,
                                   prob_to_apply=config.mix_prob)
        return {'images': images, 'labels': labels}

    return augment


class AugmentedArrayDataset:
    """In-memory uint8 images + labels -> augmented, sharded device batches.

    The whole sample/augment graph is one jit per step: host work is zero
    beyond the initial device_put of the raw arrays.

    Training samples uniformly with replacement (infinite stream); eval
    walks the examples *sequentially once* — ``num_batches`` batches with a
    mask-padded tail — so eval metrics cover each held-out example exactly
    once (reference pads eval to fixed batches the same way,
    data/input_pipeline.py:360-376).

    ``split=(name, lo, hi)`` keeps only the ``[lo, hi)`` slice of the fixed
    permutation shared with ``grain_loader.SubsetSource`` — disjoint ranges
    give provably disjoint train/eval example sets.
    """

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 batch_size: int, image_size: int,
                 augmentation: str = 'cutmix_mixup_randaugment_405',
                 training: bool = True, seed: int = 0,
                 mesh: Optional[Mesh] = None,
                 split: Optional[tuple] = None):
        assert images.ndim == 4 and images.shape[0] == labels.shape[0]
        if split is not None:
            from sav_tpu.data.grain_loader import SubsetSource
            _, lo, hi = split
            n = images.shape[0]
            start, stop = int(round(lo * n)), int(round(hi * n))
            if stop <= start:
                raise ValueError(
                    f'split [{lo:g}:{hi:g}] of {n} examples is empty')
            perm = np.random.RandomState(
                SubsetSource._PERM_SEED).permutation(n)[start:stop]
            images, labels = images[perm], np.asarray(labels)[perm]
        self.batch_size = batch_size
        self._images = jnp.asarray(images)
        self._labels = jnp.asarray(labels, jnp.int32)
        self._base_rng = jax.random.PRNGKey(seed)
        self._training = training

        augment_fn = make_train_augment_fn(image_size,
                                           parse_augment_name(augmentation))
        num_examples = images.shape[0]
        self.num_batches = (None if training
                            else -(-num_examples // batch_size))

        def make_batch(rng, start, data_images, data_labels):
            if training:
                r_sample, r_augment = jax.random.split(rng)
                idx = jax.random.randint(r_sample, (batch_size,), 0,
                                         num_examples)
                raw = data_images[idx].astype(jnp.float32)
                return augment_fn(r_augment, raw, data_labels[idx])
            idx = start + jnp.arange(batch_size)
            mask = (idx < num_examples).astype(jnp.float32)
            idx = jnp.minimum(idx, num_examples - 1)
            raw = data_images[idx].astype(jnp.float32)
            images = jax.vmap(
                lambda im: preprocess.eval_preprocess(im, image_size))(raw)
            return {'images': images, 'labels': data_labels[idx],
                    'mask': mask}

        shardings = None
        if mesh is not None:
            shardings = NamedSharding(mesh, P(DATA_AXIS))
        self._make = jax.jit(make_batch, out_shardings=shardings)

    def batch(self, step: int):
        if self.num_batches is not None and step >= self.num_batches:
            raise StopIteration
        return self._make(jax.random.fold_in(self._base_rng, step),
                          np.int32(step * self.batch_size),
                          self._images, self._labels)

    def __iter__(self):
        step = 0
        while self.num_batches is None or step < self.num_batches:
            yield self.batch(step)
            step += 1


def create_dataset(name: str, batch_size: int, image_size: int,
                   num_classes: int = 1000, seed: int = 0,
                   mesh: Optional[Mesh] = None,
                   augmentation: str = 'none', training: bool = True,
                   num_workers: int = 0, split: Optional[tuple] = None):
    """Dataset factory: 'synthetic', 'synthetic_augmented', or a path to an
    ``.npz`` file with uint8 'images' and int 'labels' arrays.

    Every name may carry a ``?split=`` suffix (grammar:
    ``parse_split_fractions``) or an explicit ``split=(name, lo, hi)``
    argument. For ``tfds:`` sources the split *name* picks the TFDS split
    and the fractions (if any) select a deterministic permutation subset of
    it; for array/JPEG/tar sources the fractions partition the single
    source — ``[:90%]`` for train and ``[90%:]`` for eval are disjoint by
    construction (reference reads distinct per-split instructions instead,
    data/input_pipeline.py:109-122).
    """
    from sav_tpu.data.synthetic import SyntheticDataset

    name, inline_split = parse_dataset_spec(name)
    if inline_split is not None:
        if split is not None:
            raise ValueError(
                f'{name!r}: split given both inline (?split=) and as an '
                f'argument')
        split = inline_split

    if name == 'synthetic':
        if split is not None:
            raise ValueError("'synthetic' is an infinite stream; "
                             'splits do not apply')
        return SyntheticDataset(batch_size, image_size,
                                num_classes=num_classes, seed=seed,
                                mesh=mesh)
    if name == 'synthetic_augmented':
        rng = np.random.RandomState(seed)
        images = rng.randint(0, 256, (256, 64, 64, 3), dtype=np.uint8)
        labels = rng.randint(0, num_classes, (256,))
        return AugmentedArrayDataset(images, labels, batch_size, image_size,
                                     augmentation=augmentation,
                                     training=training, seed=seed, mesh=mesh,
                                     split=split)
    if name.endswith('.npz') and '*' not in name:
        arrays = np.load(name)
        return AugmentedArrayDataset(arrays['images'], arrays['labels'],
                                     batch_size, image_size,
                                     augmentation=augmentation,
                                     training=training, seed=seed, mesh=mesh,
                                     split=split)
    if name.startswith('tfds:'):
        # TFDS-backed ImageNet et al. (reference: data/input_pipeline.py:
        # 109-117 builds from tfds.builder('imagenet2012:5.1.0')). Uses
        # tfds.data_source — TFDS's random-access (ArrayRecord) reader — so
        # the same Grain loader + on-device augmentation serve it; no
        # tf.data graph anywhere.
        try:
            import tensorflow_datasets as tfds  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "dataset 'tfds:...' requires tensorflow_datasets "
                '(not installed in this image)') from exc
        from sav_tpu.data.grain_loader import GrainDataset, SubsetSource
        from sav_tpu.data.jpeg_source import TfdsSource

        spec = name[len('tfds:'):]
        # default: 'train' for training, TFDS's validation/test for eval
        tfds_split = 'train' if training else None
        lo, hi = 0.0, 1.0
        if ',' in spec:         # verbatim TFDS split, e.g. 'name,train[:5%]'
            if split is not None:
                raise ValueError(
                    f'{name!r}: split given both via ",<split>" and '
                    f'?split=/argument')
            spec, tfds_split = spec.split(',', 1)
        elif split is not None:
            tfds_split, lo, hi = split
        decode_size = max(int(round(image_size / 0.875)), image_size)
        source = TfdsSource(spec, tfds_split, decode_size)
        if (lo, hi) != (0.0, 1.0):
            source = SubsetSource(source, lo, hi)
        return GrainDataset(source, batch_size, image_size,
                            augmentation=augmentation, training=training,
                            seed=seed, mesh=mesh, num_workers=num_workers)
    if name.endswith('.npz') or name.endswith('.tar') or os.path.isdir(name):
        import glob as globlib

        from sav_tpu.data.grain_loader import (GrainDataset, NpzShardSource,
                                               SubsetSource)
        from sav_tpu.data import jpeg_source

        # JPEG decode to ~= eval resize-small geometry; the device-side
        # distorted-bbox crop then works from this frame.
        decode_size = max(int(round(image_size / 0.875)), image_size)
        if name.endswith('.npz'):
            source = NpzShardSource(name)      # glob pattern or single file
        elif name.endswith('.tar'):
            tars = sorted(globlib.glob(name)) if '*' in name else [name]
            source = jpeg_source.JpegTarSource(tars, decode_size=decode_size)
        elif globlib.glob(os.path.join(name, '*.npz')):
            source = NpzShardSource(os.path.join(name, '*.npz'))
        elif jpeg_source.looks_like_jpeg_folder(name):
            source = jpeg_source.JpegFolderSource(name,
                                                  decode_size=decode_size)
        elif globlib.glob(os.path.join(name, '*.tar')):
            source = jpeg_source.JpegTarSource(
                sorted(globlib.glob(os.path.join(name, '*.tar'))),
                decode_size=decode_size)
        else:
            raise ValueError(
                f'directory {name!r} holds neither .npz shards, '
                f'class-subdirectory JPEGs, nor .tar shards')
        if split is not None:
            _, lo, hi = split
            if (lo, hi) != (0.0, 1.0):
                source = SubsetSource(source, lo, hi)
        return GrainDataset(source, batch_size, image_size,
                            augmentation=augmentation, training=training,
                            seed=seed, mesh=mesh, num_workers=num_workers)
    raise ValueError(
        f'Unknown dataset {name!r}; use synthetic, synthetic_augmented, an '
        f'.npz path/glob, a .tar of JPEGs, a directory of .npz/.tar shards, '
        f'or an ImageFolder-style JPEG tree (TFDS-backed ImageNet requires '
        f'tensorflow_datasets).')
