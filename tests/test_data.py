"""Data tier: image ops correctness, RandAugment determinism, mixup/cutmix
semantics, preprocessing shapes, pipeline determinism."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sav_tpu.data import image_ops, mix, preprocess
from sav_tpu.data.pipeline import (AugmentConfig, create_dataset,
                                   make_train_augment_fn, parse_augment_name)
from sav_tpu.data.randaugment import RandAugment, translate_const
from sav_tpu.data.synthetic import SyntheticDataset


def sample_image(seed=0, size=32):
    return jax.random.uniform(jax.random.PRNGKey(seed), (size, size, 3),
                              minval=0.0, maxval=255.0)


class TestImageOps:

    def test_invert_solarize(self):
        img = sample_image()
        np.testing.assert_allclose(np.asarray(image_ops.invert(img)),
                                   255.0 - np.asarray(img))
        sol = np.asarray(image_ops.solarize(img, 128.0))
        arr = np.asarray(img)
        np.testing.assert_allclose(
            sol, np.where(arr < 128.0, arr, 255.0 - arr))

    def test_posterize(self):
        img = jnp.array([[[255.0, 73.0, 128.0]]])
        out = np.asarray(image_ops.posterize(img, 2))
        # keep top 2 bits: 255->192, 73->64, 128->128
        np.testing.assert_array_equal(out, [[[192.0, 64.0, 128.0]]])

    def test_brightness_extremes(self):
        img = sample_image()
        np.testing.assert_allclose(
            np.asarray(image_ops.brightness(img, 0.0)), 0.0)
        np.testing.assert_allclose(np.asarray(image_ops.brightness(img, 1.0)),
                                   np.asarray(img), atol=1e-4)

    def test_autocontrast_stretches(self):
        img = jnp.full((8, 8, 3), 100.0).at[0, 0].set(50.0)
        out = np.asarray(image_ops.autocontrast(img))
        assert out.min() == 0.0 and out.max() == 255.0

    def test_equalize_uniform_is_noop_shape(self):
        img = sample_image()
        out = image_ops.equalize(img)
        assert out.shape == img.shape
        assert 0 <= float(out.min()) and float(out.max()) <= 255

    def test_rotate_360_identity(self):
        img = sample_image()
        out = np.asarray(image_ops.rotate(img, jnp.float32(360.0)))
        np.testing.assert_allclose(out, np.asarray(img), atol=1e-3)

    def test_translate_shifts(self):
        img = sample_image()
        out = np.asarray(image_ops.translate_x(img, jnp.float32(-5.0)))
        # output(x) = input(x - 5): content moves right by 5
        np.testing.assert_allclose(out[:, 5:, :], np.asarray(img)[:, :-5, :],
                                   atol=1e-3)
        np.testing.assert_allclose(out[:, :5, :], image_ops.GRAY)

    def test_cutout_fills_box(self):
        img = jnp.zeros((16, 16, 3))
        out = np.asarray(image_ops.cutout(img, jax.random.PRNGKey(0),
                                          pad_size=4, replace=128.0))
        assert (out == 128.0).any() and (out == 0.0).any()

    def test_random_erasing_prob(self):
        img = jnp.zeros((16, 16, 3))
        out0 = image_ops.random_erasing(img, jax.random.PRNGKey(0),
                                        erase_prob=0.0)
        np.testing.assert_array_equal(np.asarray(out0), 0.0)
        out1 = image_ops.random_erasing(img, jax.random.PRNGKey(0),
                                        erase_prob=1.0)
        assert np.abs(np.asarray(out1)).sum() > 0


class TestRandAugment:

    def test_translate_const_table(self):
        assert translate_const(224) == 100
        assert translate_const(32) == 10
        assert translate_const(100) == 30

    def test_deterministic_and_in_range(self):
        aug = RandAugment(num_layers=2, magnitude=5.0, num_levels=10,
                          size=32)
        img = sample_image()
        rng = jax.random.PRNGKey(3)
        a = jax.jit(aug.__call__)(rng, img)
        b = jax.jit(aug.__call__)(rng, img)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert 0.0 <= float(a.min()) and float(a.max()) <= 255.0
        # different rng -> different image (with overwhelming probability)
        c = jax.jit(aug.__call__)(jax.random.PRNGKey(4), img)
        assert not np.array_equal(np.asarray(a), np.asarray(c))


class TestMix:

    def test_mixup_ratio_and_blend(self):
        images = jnp.stack([jnp.zeros((8, 8, 3)), jnp.ones((8, 8, 3))])
        labels = jnp.array([0, 1])
        out = mix.mixup(jax.random.PRNGKey(0), images, labels, alpha=0.8)
        ratio = np.asarray(out['ratio'])
        assert np.all(ratio >= 0.5) and np.all(ratio <= 1.0)
        assert set(np.asarray(out['labels']).tolist()) == {0, 1}

    def test_cutmix_ratio_matches_area(self):
        images = jnp.stack([jnp.zeros((16, 16, 3)), jnp.ones((16, 16, 3))])
        labels = jnp.array([0, 1])
        out = mix.cutmix(jax.random.PRNGKey(1), images, labels, alpha=1.0)
        # example 0 mixes with example 1 (ones): pasted fraction == 1 - ratio
        pasted = np.asarray(out['images'][0]).mean()
        np.testing.assert_allclose(pasted, 1.0 - float(out['ratio'][0]),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(out['mix_labels']), [1, 0])

    def test_mix_augment_gate(self):
        images = jnp.ones((4, 8, 8, 3))
        labels = jnp.arange(4)
        out = mix.mix_augment(jax.random.PRNGKey(0), images, labels,
                              prob_to_apply=0.0)
        np.testing.assert_allclose(np.asarray(out['ratio']), 1.0)
        np.testing.assert_array_equal(np.asarray(out['images']),
                                      np.asarray(images))


class TestPreprocess:

    def test_eval_preprocess_shape_and_range(self):
        img = sample_image(size=48)
        out = preprocess.eval_preprocess(img, 32)
        assert out.shape == (32, 32, 3)
        assert abs(float(out.mean())) < 5.0  # normalized scale

    def test_random_resized_crop_shape(self):
        img = sample_image(size=48)
        out = preprocess.random_resized_crop(jax.random.PRNGKey(0), img, 32)
        assert out.shape == (32, 32, 3)
        assert float(out.min()) >= -1.0 and float(out.max()) <= 256.0

    def test_flip(self):
        img = sample_image()
        flipped = preprocess.random_flip(jax.random.PRNGKey(0), img)
        arr, farr = np.asarray(img), np.asarray(flipped)
        assert (np.array_equal(farr, arr)
                or np.array_equal(farr, arr[:, ::-1, :]))


class TestPipeline:

    def test_parse_augment_names(self):
        # NFNets grammar: 'randaugment_405' = 4 layers, fixed magnitude 5
        cfg = parse_augment_name('cutmix_mixup_randaugment_405')
        assert cfg.use_mix and cfg.use_randaugment
        assert cfg.num_layers == 4
        assert cfg.magnitude == pytest.approx(5.0)
        assert cfg.magstd is None and cfg.ra_prob is None
        assert cfg.mix_prob == 1.0
        assert not cfg.use_colorjitter

        cfg = parse_augment_name('cutmix_mixup_0.4_randaugment_215')
        assert cfg.mix_prob == pytest.approx(0.4)
        assert cfg.num_layers == 2
        assert cfg.magnitude == pytest.approx(15.0)

        # bare 'randaugment' = the reference pipeline defaults
        # (input_pipeline.py:78-85: 2 layers, m9, mstd 0.5, prob 0.5)
        cfg = parse_augment_name('cutmix_mixup_randaugment')
        assert cfg.num_layers == 2
        assert cfg.magnitude == pytest.approx(9.0)
        assert cfg.magstd == pytest.approx(0.5)
        assert cfg.ra_prob == pytest.approx(0.5)

        cfg = parse_augment_name('randaugment_405_colorjitter')
        assert cfg.use_colorjitter
        assert cfg.colorjitter_strength == pytest.approx(0.3)
        cfg = parse_augment_name('colorjitter_0.8')
        assert cfg.use_colorjitter and not cfg.use_randaugment
        assert cfg.colorjitter_strength == pytest.approx(0.8)

        cfg = parse_augment_name('none')
        assert not cfg.use_mix and not cfg.use_randaugment

    def test_colorjitter_composed_into_augment_fn(self):
        # identical rngs, jitter on vs off -> different images (the round-1
        # gap: color.py existed but nothing reached it from training)
        images = jax.random.uniform(jax.random.PRNGKey(0), (2, 48, 48, 3),
                                    maxval=255.0)
        labels = jnp.zeros((2,), jnp.int32)
        base = AugmentConfig(use_mix=False, use_randaugment=False,
                             erase_prob=0.0)
        plain = make_train_augment_fn(32, base)
        jittered = make_train_augment_fn(
            32, dataclasses.replace(base, use_colorjitter=True))
        rng = jax.random.PRNGKey(1)
        out_a = plain(rng, images, labels)['images']
        out_b = jittered(rng, images, labels)['images']
        assert not np.array_equal(np.asarray(out_a), np.asarray(out_b))
        assert np.isfinite(np.asarray(out_b)).all()

    def test_augment_fn_end_to_end(self):
        fn = jax.jit(make_train_augment_fn(32, AugmentConfig()))
        images = jax.random.uniform(jax.random.PRNGKey(0), (4, 48, 48, 3),
                                    maxval=255.0)
        labels = jnp.arange(4)
        out = fn(jax.random.PRNGKey(1), images, labels)
        assert out['images'].shape == (4, 32, 32, 3)
        assert {'labels', 'mix_labels', 'ratio'} <= set(out)
        assert np.isfinite(np.asarray(out['images'])).all()

    def test_synthetic_deterministic(self):
        data = SyntheticDataset(4, 16, num_classes=10, seed=7)
        a, b = data.batch(3), data.batch(3)
        np.testing.assert_array_equal(np.asarray(a['images']),
                                      np.asarray(b['images']))
        c = data.batch(4)
        assert not np.array_equal(np.asarray(a['images']),
                                  np.asarray(c['images']))

    def test_augmented_array_dataset(self):
        data = create_dataset('synthetic_augmented', batch_size=4,
                              image_size=32, num_classes=10, seed=0,
                              augmentation='cutmix_mixup_randaugment_405')
        a = data.batch(0)
        assert a['images'].shape == (4, 32, 32, 3)
        b = data.batch(0)
        np.testing.assert_array_equal(np.asarray(a['images']),
                                      np.asarray(b['images']))
