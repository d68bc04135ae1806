"""Stateless on-device RandAugment.

JAX port of the reference's TF RandAugment (reference:
data/preprocess/rand_augment.py:23-261): the same 16-op ImageNet set
(incl. Identity/SolarizeAdd/Invert), the same level->argument mappings
(l.59-124), uniform / fixed / gaussian magnitude sampling (l.176-206), the
same per-size TRANSLATE_CONST table (l.162-172), optional per-layer apply
probability, and an optional trailing cutout.

The ``tf.switch_case`` over ops becomes ``jax.lax.switch``; everything is a
pure function of an RNG key, vmappable over the batch and jit-compiled onto
the TPU, replacing host-CPU augmentation threads.

Images are float32 [H, W, C] in [0, 255].
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from sav_tpu.data import image_ops


def translate_const(size: int) -> int:
    return {224: 100, 128: 40, 96: 30, 32: 10}.get(size, int(0.3 * size))


def _signed(rng, value):
    """Negates ``value`` with probability 1/2."""
    flip = jax.random.bernoulli(rng, 0.5)
    return jnp.where(flip, value, -value)


def _op_table(size: int):
    """(name, fn(image, sign_rng, cut_rng, level)) for the 16-op set."""
    tconst = float(translate_const(size))

    def enhance(fn):
        return lambda img, rs, rc, lvl: fn(img, lvl * 1.8 + 0.1)

    return [
        ('AutoContrast',
         lambda img, rs, rc, lvl: image_ops.autocontrast(img)),
        ('Equalize', lambda img, rs, rc, lvl: image_ops.equalize(img)),
        ('Rotate',
         lambda img, rs, rc, lvl: image_ops.rotate(
             img, _signed(rs, lvl * 30.0))),
        ('Posterize',
         lambda img, rs, rc, lvl: image_ops.posterize(
             img, (lvl * 4).astype(jnp.int32))),
        ('Solarize',
         lambda img, rs, rc, lvl: image_ops.solarize(
             img, jnp.floor(lvl * 256.0))),
        ('Color', enhance(image_ops.color)),
        ('Contrast', enhance(image_ops.contrast)),
        ('Brightness', enhance(image_ops.brightness)),
        ('Sharpness', enhance(image_ops.sharpness)),
        ('ShearX',
         lambda img, rs, rc, lvl: image_ops.shear_x(
             img, _signed(rs, lvl * 0.3))),
        ('ShearY',
         lambda img, rs, rc, lvl: image_ops.shear_y(
             img, _signed(rs, lvl * 0.3))),
        ('TranslateX',
         lambda img, rs, rc, lvl: image_ops.translate_x(
             img, _signed(rs, lvl * tconst))),
        ('TranslateY',
         lambda img, rs, rc, lvl: image_ops.translate_y(
             img, _signed(rs, lvl * tconst))),
        ('Identity', lambda img, rs, rc, lvl: img),
        ('SolarizeAdd',
         lambda img, rs, rc, lvl: image_ops.solarize_add(
             img, jnp.floor(lvl * 110.0))),
        ('Invert', lambda img, rs, rc, lvl: image_ops.invert(img)),
    ]


@dataclasses.dataclass(frozen=True)
class RandAugment:
    """Config-carrying callable: ``augment(rng, image) -> image``."""

    num_layers: int = 2
    prob_to_apply: Optional[float] = None
    magnitude: Optional[float] = None   # LEVEL units, in [0, num_levels]
    num_levels: Optional[int] = 10
    cutout: bool = True
    magstd: Optional[float] = None
    size: int = 224

    def _sample_level(self, rng):
        """Returns the op strength as a fraction in [0, 1].

        ``magnitude``/``magstd`` are always in level units (the reference's
        convention, rand_augment.py:176-206); the division by num_levels
        happens exactly once, here, for every sampling mode.
        """
        if self.magstd:
            assert self.magnitude is not None, 'magstd requires magnitude'
            level = self.magnitude + self.magstd * jax.random.normal(rng, ())
            level = jnp.clip(level, 0.0, self.num_levels)
        elif self.magnitude is not None:
            level = jnp.float32(self.magnitude)
        elif self.num_levels is None:
            return jax.random.uniform(rng, ())
        else:
            level = jax.random.randint(
                rng, (), 0, self.num_levels + 1).astype(jnp.float32)
        return level / self.num_levels

    def _one_layer(self, rng, image):
        rng_branch, rng_apply, rng_level, rng_sign, rng_cut = (
            jax.random.split(rng, 5))
        level = self._sample_level(rng_level)

        ops = _op_table(self.size)
        branch_fns = [
            (lambda fn: lambda img: fn(img, rng_sign, rng_cut, level))(fn)
            for _, fn in ops
        ]
        index = jax.random.randint(rng_branch, (), 0, len(branch_fns))
        augmented = jax.lax.switch(index, branch_fns, image)

        if self.prob_to_apply is not None:
            take = jax.random.uniform(rng_apply, ()) < self.prob_to_apply
            augmented = jnp.where(take, augmented, image)
        return augmented

    def __call__(self, rng, image):
        rng_cut, *layer_rngs = jax.random.split(rng, self.num_layers + 1)
        for layer_rng in layer_rngs:
            image = self._one_layer(layer_rng, image)
        if self.cutout:
            # trailing cutout box is half the image side (reference:
            # augment_ops.py:258 cutout scale=0.5), clipped at borders
            image = image_ops.cutout(image, rng_cut,
                                     pad_size=image.shape[0] // 4)
        return image
