"""On-device SimCLR-style color jitter.

Device-side equivalent of the reference's TF color utilities
(reference: data/preprocess/color_util.py:51-194 color_jitter_rand,
augment_utils.py:69-80 'colorjitter' augment type): multiplicative random
brightness, contrast about the grayscale mean, saturation blending and HSV
hue rotation, applied in a random order, plus random grayscale. All pure
jnp on [H, W, C] float32 images in [0, 255], vmap/jit-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sav_tpu.data import image_ops


def rgb_to_hsv(rgb):
    """[..., 3] in [0,1] -> HSV in [0,1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    value = maxc
    delta = maxc - minc
    safe = jnp.where(delta > 0, delta, 1.0)

    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    hue = jnp.where(r == maxc, bc - gc,
                    jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    hue = (hue / 6.0) % 1.0
    hue = jnp.where(delta > 0, hue, 0.0)
    saturation = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    return jnp.stack([hue, saturation, value], axis=-1)


def hsv_to_rgb(hsv):
    """[..., 3] HSV in [0,1] -> RGB in [0,1]."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6

    r = jnp.choose(i, [v, q, p, p, t, v], mode='clip')
    g = jnp.choose(i, [t, v, v, q, p, p], mode='clip')
    b = jnp.choose(i, [p, p, t, v, v, q], mode='clip')
    return jnp.stack([r, g, b], axis=-1)


def random_brightness(rng, image, max_delta):
    """Multiplicative brightness (SimCLR v2 style)."""
    factor = jax.random.uniform(rng, (), minval=1.0 - max_delta,
                                maxval=1.0 + max_delta)
    return jnp.clip(image * factor, 0.0, 255.0)


def random_contrast(rng, image, lower, upper):
    factor = jax.random.uniform(rng, (), minval=lower, maxval=upper)
    mean = jnp.mean(image, axis=(0, 1), keepdims=True)
    return jnp.clip((image - mean) * factor + mean, 0.0, 255.0)


def random_saturation(rng, image, lower, upper):
    factor = jax.random.uniform(rng, (), minval=lower, maxval=upper)
    gray = image_ops.grayscale(image)
    return jnp.clip(gray + (image - gray) * factor, 0.0, 255.0)


def random_hue(rng, image, max_delta):
    delta = jax.random.uniform(rng, (), minval=-max_delta, maxval=max_delta)
    hsv = rgb_to_hsv(image / 255.0)
    hue = (hsv[..., 0] + delta) % 1.0
    rgb = hsv_to_rgb(jnp.stack([hue, hsv[..., 1], hsv[..., 2]], axis=-1))
    return jnp.clip(rgb * 255.0, 0.0, 255.0)


def to_grayscale(image):
    return image_ops.grayscale(image)


def color_jitter(rng, image, strength: float = 1.0,
                 random_order: bool = True,
                 grayscale_prob: float = 0.0):
    """SimCLR color jitter: brightness/contrast/saturation/hue in random
    order with strengths (0.8s, 0.8s, 0.8s, 0.2s)."""
    brightness = 0.8 * strength
    contrast = 0.8 * strength
    saturation = 0.8 * strength
    hue = 0.2 * strength

    rng_perm, rng_gray, *op_rngs = jax.random.split(rng, 7)

    ops = [
        lambda r, im: random_brightness(r, im, brightness),
        lambda r, im: random_contrast(r, im, max(0.0, 1 - contrast),
                                      1 + contrast),
        lambda r, im: random_saturation(r, im, max(0.0, 1 - saturation),
                                        1 + saturation),
        lambda r, im: random_hue(r, im, hue),
    ]

    if random_order:
        order = jax.random.permutation(rng_perm, 4)
    else:
        order = jnp.arange(4)

    for slot in range(4):
        branch_fns = [
            (lambda op, r: lambda im: op(r, im))(op, op_rngs[slot])
            for op in ops
        ]
        image = jax.lax.switch(order[slot], branch_fns, image)

    if grayscale_prob > 0.0:
        take = jax.random.bernoulli(rng_gray, grayscale_prob)
        image = jnp.where(take, to_grayscale(image), image)
    return image


def gaussian_blur(rng, image, kernel_size: int = None, sigma_range=(0.1, 2.0),
                  apply_prob: float = 1.0):
    """Separable gaussian blur with random sigma (reference:
    color_util.py:340-383)."""
    height = image.shape[0]
    if kernel_size is None:
        kernel_size = max(3, (height // 10) | 1)
    rng_sigma, rng_apply = jax.random.split(rng)
    sigma = jax.random.uniform(rng_sigma, (), minval=sigma_range[0],
                               maxval=sigma_range[1])

    radius = kernel_size // 2
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    kernel = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    kernel = kernel / jnp.sum(kernel)

    channels = image.shape[-1]
    lhs = image[None].transpose(0, 3, 1, 2)
    kh = jnp.tile(kernel.reshape(1, 1, -1, 1), (channels, 1, 1, 1))
    kw = jnp.tile(kernel.reshape(1, 1, 1, -1), (channels, 1, 1, 1))
    blurred = jax.lax.conv_general_dilated(
        lhs, kh, (1, 1), 'SAME', feature_group_count=channels)
    blurred = jax.lax.conv_general_dilated(
        blurred, kw, (1, 1), 'SAME', feature_group_count=channels)
    blurred = blurred[0].transpose(1, 2, 0)

    if apply_prob < 1.0:
        take = jax.random.bernoulli(rng_apply, apply_prob)
        blurred = jnp.where(take, blurred, image)
    return blurred
