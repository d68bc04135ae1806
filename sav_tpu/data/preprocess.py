"""On-device train/eval image preprocessing.

Device-side equivalents of the reference's per-example tf.data transforms
(reference: data/preprocess/preprocess.py): distorted-bbox random resized
crop + flip for training (l.61-93), keep-aspect resize-small + central crop
for eval (l.26-58, 191-204), and mean/std normalization. All functions take
decoded ``[H, W, C]`` float32 images in [0, 255] and are vmap/jit-friendly
with static output shapes (dynamic crop windows are expressed as
scale-and-translate resizes, which XLA maps onto gathers on device).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sav_tpu.data import constants


def normalize(image, mean=constants.IMAGENET_1K_MEAN,
              std=constants.IMAGENET_1K_STD):
    """[0, 255] -> standardized float using dataset statistics."""
    mean = jnp.asarray(mean, image.dtype) * 255.0
    std = jnp.asarray(std, image.dtype) * 255.0
    return (image - mean) / std


def _resize_window(image, y0, x0, crop_h, crop_w, out_size: int,
                   method: str = 'bilinear'):
    """Resizes the window [y0:y0+crop_h, x0:x0+crop_w] to out_size^2.

    Uses ``jax.image.scale_and_translate`` so the window bounds may be traced
    values (a dynamic crop + static resize in one gather-based op).
    """
    scale = jnp.stack([out_size / crop_h, out_size / crop_w])
    translation = jnp.stack([-y0 * scale[0], -x0 * scale[1]])
    return jax.image.scale_and_translate(
        image, (out_size, out_size, image.shape[-1]),
        spatial_dims=(0, 1),
        scale=scale.astype(jnp.float32),
        translation=translation.astype(jnp.float32),
        method=method)


def random_resized_crop(rng, image, out_size: int,
                        area_range: Tuple[float, float] = (0.05, 1.0),
                        ratio_range: Tuple[float, float] = (3 / 4, 4 / 3)):
    """Inception-style distorted-bbox crop resized to ``out_size``.

    Single-sample variant (no retry loop: shapes must be static); falls back
    toward the full frame when the sampled box does not fit.
    """
    height, width = image.shape[0], image.shape[1]
    r_area, r_ratio, r_y, r_x = jax.random.split(rng, 4)

    area = jax.random.uniform(r_area, (), minval=area_range[0],
                              maxval=area_range[1]) * height * width
    log_ratio = jax.random.uniform(
        r_ratio, (), minval=jnp.log(ratio_range[0]),
        maxval=jnp.log(ratio_range[1]))
    ratio = jnp.exp(log_ratio)

    crop_w = jnp.sqrt(area * ratio)
    crop_h = jnp.sqrt(area / ratio)
    crop_w = jnp.clip(crop_w, 1.0, width)
    crop_h = jnp.clip(crop_h, 1.0, height)

    y0 = jax.random.uniform(r_y, ()) * (height - crop_h)
    x0 = jax.random.uniform(r_x, ()) * (width - crop_w)
    return _resize_window(image, y0, x0, crop_h, crop_w, out_size)


def random_flip(rng, image):
    return jnp.where(jax.random.bernoulli(rng), image[:, ::-1, :], image)


def central_crop_resize(image, out_size: int,
                        crop_fraction: float = constants.DEFAULT_CROP_FRACTION):
    """Keep-aspect resize-small to ``out_size / crop_fraction`` then central
    crop — the reference eval transform (preprocess.py:191-204 with
    256/224 == 1/0.875)."""
    height, width = image.shape[0], image.shape[1]
    small = min(height, width)
    crop = small * crop_fraction
    y0 = (height - crop) / 2.0
    x0 = (width - crop) / 2.0
    return _resize_window(image, jnp.float32(y0), jnp.float32(x0),
                          jnp.float32(crop), jnp.float32(crop), out_size)


def train_preprocess(rng, image, out_size: int):
    """Random resized crop + flip (reference: preprocess.py:80-93)."""
    r_crop, r_flip = jax.random.split(rng)
    image = random_resized_crop(r_crop, image, out_size)
    return random_flip(r_flip, image)


def eval_preprocess(image, out_size: int):
    return normalize(central_crop_resize(image, out_size))


def train_cifar_preprocess(rng, image):
    """CIFAR-style train transform: pad to 36, random 32x32 crop, flip
    (reference: data/preprocess/preprocess.py:96-108)."""
    r_y, r_x, r_flip = jax.random.split(rng, 3)
    padded = jnp.pad(image, ((4, 4), (4, 4), (0, 0)))
    y0 = jax.random.randint(r_y, (), 0, 9)
    x0 = jax.random.randint(r_x, (), 0, 9)
    cropped = jax.lax.dynamic_slice(padded, (y0, x0, 0),
                                    (32, 32, image.shape[-1]))
    return random_flip(r_flip, cropped)
