"""On-device image ops: the JAX equivalents of the reference's tf.data
augmentation kernels.

The reference implements these as TF/tensorflow_addons host-CPU ops
(reference: data/preprocess/augment_ops.py — solarize l.372, posterize l.414,
rotate/translate/shear via tfa affine warps l.431-475, autocontrast l.478,
sharpness l.514, equalize l.545, cutout l.258, random_erasing l.184, blend
l.302). Here they are pure jnp on ``[H, W, C]`` float32 images in [0, 255],
jit/vmap-friendly with static shapes, so augmentation runs *on the TPU*
batched instead of on host threads.

Geometric ops use a single inverse-affine nearest/bilinear resampler instead
of per-op warp code.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

GRAY = 128.0  # replace/fill value used by the reference ops


def _clip(image):
    return jnp.clip(image, 0.0, 255.0)


def blend(image1, image2, factor):
    """Interpolates/extrapolates from image2 toward image1 by ``factor``
    (0 -> image2, 1 -> image1), clipped to valid range."""
    return _clip(image2 + factor * (image1 - image2))


# ---------------------------------------------------------------------------
# Color / intensity ops
# ---------------------------------------------------------------------------

def invert(image):
    return 255.0 - image


def solarize(image, threshold=128.0):
    return jnp.where(image < threshold, image, 255.0 - image)


def solarize_add(image, addition=0.0, threshold=128.0):
    return jnp.where(image < threshold, _clip(image + addition), image)


def posterize(image, bits):
    """Keeps the top ``bits`` bits of each channel value."""
    shift = (8 - bits).astype(jnp.uint8) if hasattr(bits, 'astype') \
        else jnp.uint8(8 - bits)
    quantized = jnp.right_shift(image.astype(jnp.uint8), shift)
    return jnp.left_shift(quantized, shift).astype(image.dtype)


def grayscale(image):
    weights = jnp.array([0.2989, 0.5870, 0.1140], image.dtype)
    gray = jnp.tensordot(image, weights, axes=[[-1], [0]])
    return jnp.broadcast_to(gray[..., None], image.shape)


def brightness(image, factor):
    return blend(image, jnp.zeros_like(image), factor)


def contrast(image, factor):
    # degenerate image: the mean of the rounded grayscale, like PIL
    mean = jnp.mean(jnp.round(grayscale(image)))
    return blend(image, jnp.full_like(image, mean), factor)


def color(image, factor):
    return blend(image, jnp.round(grayscale(image)), factor)


def sharpness(image, factor):
    """Blend toward a 3x3 smoothed image; border pixels stay original."""
    kernel = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]],
                       jnp.float32) / 13.0
    channels = image.shape[-1]
    # depthwise 3x3 conv, VALID, then re-pad with the original borders
    lhs = image[None].transpose(0, 3, 1, 2)  # [1, C, H, W]
    rhs = jnp.tile(kernel[None, None], (channels, 1, 1, 1))  # [C,1,3,3]
    smoothed = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1, 1), padding='VALID',
        feature_group_count=channels)[0].transpose(1, 2, 0)
    smoothed = _clip(smoothed)
    padded = jnp.pad(smoothed, ((1, 1), (1, 1), (0, 0)))
    mask = jnp.zeros(image.shape[:2], bool).at[1:-1, 1:-1].set(True)
    degenerate = jnp.where(mask[..., None], padded, image)
    return blend(image, degenerate, factor)


def autocontrast(image):
    """Per-channel linear stretch to the full [0, 255] range."""
    lo = jnp.min(image, axis=(0, 1), keepdims=True)
    hi = jnp.max(image, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-6)
    stretched = _clip((image - lo) * scale)
    return jnp.where(hi > lo, stretched, image)


def equalize(image):
    """Per-channel histogram equalization with a 256-bin LUT.

    Matches the PIL/TF formulation (reference: augment_ops.py:545-582):
    step = (nonzero_pixels - last_bin) // 255; lut = (cumsum + step/2) / step.
    """
    def one_channel(channel):
        values = channel.astype(jnp.int32).reshape(-1)
        histo = jnp.zeros((256,), jnp.int32).at[values].add(1)
        nonzero = histo > 0
        # last nonzero bin's count
        last_idx = jnp.max(jnp.where(nonzero, jnp.arange(256), -1))
        step = (jnp.sum(histo) - histo[last_idx]) // 255

        lut = (jnp.cumsum(histo) + (step // 2)) // jnp.maximum(step, 1)
        lut = jnp.clip(jnp.concatenate([jnp.zeros((1,), lut.dtype),
                                        lut[:-1]]) , 0, 255)
        result = jnp.where(step == 0, values, lut[values])
        return result.reshape(channel.shape).astype(jnp.float32)

    return jnp.stack([one_channel(image[..., c])
                      for c in range(image.shape[-1])], axis=-1)


# ---------------------------------------------------------------------------
# Geometric ops (single inverse-affine resampler)
# ---------------------------------------------------------------------------

def affine_transform(image, matrix, fill=GRAY, interpolation='nearest'):
    """Applies an inverse affine map ``[a, b, tx, c, d, ty]``:
    output(y, x) = input(c*x + d*y + ty, a*x + b*y + tx) — the tfa.transform
    convention — with constant fill outside the frame."""
    height, width = image.shape[0], image.shape[1]
    a, b, tx, c, d, ty = (matrix[i] for i in range(6))

    out_y = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    out_x = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)
    src_x = a * out_x + b * out_y + tx
    src_y = c * out_x + d * out_y + ty

    def sample(ix, iy):
        valid = ((ix >= 0) & (ix <= width - 1) &
                 (iy >= 0) & (iy <= height - 1))
        ix_c = jnp.clip(ix, 0, width - 1).astype(jnp.int32)
        iy_c = jnp.clip(iy, 0, height - 1).astype(jnp.int32)
        pixels = image[iy_c, ix_c]
        return jnp.where(valid[..., None], pixels, fill)

    if interpolation == 'nearest':
        return sample(jnp.round(src_x), jnp.round(src_y))

    x0, y0 = jnp.floor(src_x), jnp.floor(src_y)
    wx, wy = src_x - x0, src_y - y0
    top = (sample(x0, y0) * (1 - wx[..., None])
           + sample(x0 + 1, y0) * wx[..., None])
    bottom = (sample(x0, y0 + 1) * (1 - wx[..., None])
              + sample(x0 + 1, y0 + 1) * wx[..., None])
    return top * (1 - wy[..., None]) + bottom * wy[..., None]


def rotate(image, degrees, fill=GRAY):
    """Rotation about the image center."""
    radians = jnp.deg2rad(degrees)
    cos, sin = jnp.cos(radians), jnp.sin(radians)
    cy = (image.shape[0] - 1) / 2.0
    cx = (image.shape[1] - 1) / 2.0
    # inverse map of a rotation by +degrees
    matrix = jnp.stack([cos, -sin, cx - cos * cx + sin * cy,
                        sin, cos, cy - sin * cx - cos * cy])
    return affine_transform(image, matrix, fill)


def shear_x(image, level, fill=GRAY):
    matrix = jnp.stack([jnp.float32(1), jnp.asarray(level, jnp.float32),
                        jnp.float32(0), jnp.float32(0), jnp.float32(1),
                        jnp.float32(0)])
    return affine_transform(image, matrix, fill)


def shear_y(image, level, fill=GRAY):
    matrix = jnp.stack([jnp.float32(1), jnp.float32(0), jnp.float32(0),
                        jnp.asarray(level, jnp.float32), jnp.float32(1),
                        jnp.float32(0)])
    return affine_transform(image, matrix, fill)


def translate_x(image, pixels, fill=GRAY):
    matrix = jnp.stack([jnp.float32(1), jnp.float32(0),
                        jnp.asarray(pixels, jnp.float32), jnp.float32(0),
                        jnp.float32(1), jnp.float32(0)])
    return affine_transform(image, matrix, fill)


def translate_y(image, pixels, fill=GRAY):
    matrix = jnp.stack([jnp.float32(1), jnp.float32(0), jnp.float32(0),
                        jnp.float32(0), jnp.float32(1),
                        jnp.asarray(pixels, jnp.float32)])
    return affine_transform(image, matrix, fill)


# ---------------------------------------------------------------------------
# Masking ops
# ---------------------------------------------------------------------------

def _box_mask(shape: Tuple[int, int], center_y, center_x, half_h, half_w):
    """Boolean [H, W] mask, True inside the (clipped) box."""
    yy = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return ((yy >= center_y - half_h) & (yy < center_y + half_h) &
            (xx >= center_x - half_w) & (xx < center_x + half_w))


def cutout(image, rng, pad_size, replace=GRAY):
    """Zeroes (to ``replace``) a random 2*pad_size square."""
    height, width = image.shape[0], image.shape[1]
    ry, rx = jax.random.split(rng)
    cy = jax.random.randint(ry, (), 0, height)
    cx = jax.random.randint(rx, (), 0, width)
    mask = _box_mask((height, width), cy, cx, pad_size, pad_size)
    return jnp.where(mask[..., None], jnp.asarray(replace, image.dtype),
                     image)


def random_erasing(image, rng, erase_prob=0.25, min_area=0.02, max_area=1/3,
                   min_aspect=0.3):
    """Fills a random box with gaussian noise with prob ``erase_prob``
    (reference: augment_ops.py:184-255). Box area/aspect are sampled once
    (single attempt, jit-static shapes)."""
    height, width = image.shape[0], image.shape[1]
    r_apply, r_area, r_aspect, r_y, r_x, r_noise = jax.random.split(rng, 6)

    area = height * width
    target = jax.random.uniform(r_area, (), minval=min_area,
                                maxval=max_area) * area
    log_ratio = jax.random.uniform(
        r_aspect, (), minval=jnp.log(min_aspect),
        maxval=jnp.log(1.0 / min_aspect))
    ratio = jnp.exp(log_ratio)
    half_h = jnp.sqrt(target * ratio).astype(jnp.int32) // 2
    half_w = jnp.sqrt(target / ratio).astype(jnp.int32) // 2
    half_h = jnp.clip(half_h, 1, height // 2)
    half_w = jnp.clip(half_w, 1, width // 2)

    cy = jax.random.randint(r_y, (), 0, height)
    cx = jax.random.randint(r_x, (), 0, width)
    mask = _box_mask((height, width), cy, cx, half_h, half_w)

    noise = jax.random.normal(r_noise, image.shape, image.dtype)
    erased = jnp.where(mask[..., None], noise, image)
    apply = jax.random.uniform(r_apply, ()) < erase_prob
    return jnp.where(apply, erased, image)


def _kernel_blend(image, kernel, factor):
    """Blend toward a depthwise-filtered image; border pixels (where the
    kernel would read outside the frame) stay original."""
    kernel = jnp.asarray(kernel, jnp.float32)
    pad = kernel.shape[0] // 2
    channels = image.shape[-1]
    lhs = image[None].transpose(0, 3, 1, 2)
    rhs = jnp.tile(kernel[None, None], (channels, 1, 1, 1))
    soft = jax.lax.conv_general_dilated(
        lhs, rhs, (1, 1), 'VALID',
        feature_group_count=channels)[0].transpose(1, 2, 0)
    padded = jnp.pad(_clip(soft), ((pad, pad), (pad, pad), (0, 0)))
    mask = jnp.zeros(image.shape[:2], bool).at[pad:-pad, pad:-pad].set(True)
    degenerate = jnp.where(mask[..., None], padded, image)
    return blend(image, degenerate, factor)


def smooth(image, factor):
    """Blend toward the PIL ImageFilter.SMOOTH kernel (reference:
    augment_ops.py 'smooth': 3x3 [1..5..1]/13)."""
    kernel = jnp.array([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
    return _kernel_blend(image, kernel, factor)


def blur(image, factor):
    """Blend toward the PIL ImageFilter.BLUR kernel (reference:
    augment_ops.py:604-629: 5x5 ring of ones / 16)."""
    kernel = jnp.array([[1., 1., 1., 1., 1.],
                        [1., 0., 0., 0., 1.],
                        [1., 0., 0., 0., 1.],
                        [1., 0., 0., 0., 1.],
                        [1., 1., 1., 1., 1.]]) / 16.0
    return _kernel_blend(image, kernel, factor)


def rescale(image, level):
    """Zoom toward the center by up to 50% (reference: augment_ops.py
    'rescale'): crop the central (1 - level/2) fraction and resize back."""
    size = image.shape[0]
    scale = 1.0 - 0.5 * level
    crop = size * scale
    offset = (size - crop) / 2.0
    scale_xy = jnp.full((2,), size / crop, jnp.float32)
    translation = jnp.full((2,), -offset * (size / crop), jnp.float32)
    return _clip(jax.image.scale_and_translate(
        image, image.shape, spatial_dims=(0, 1), scale=scale_xy,
        translation=translation, method='bilinear'))


# Registry mirroring the reference's NAME_TO_FUNC surface
# (reference: augment_ops.py:674-697). Geometric/randomized ops take
# (image, rng_or_level, ...) per their signatures above.
NAME_TO_FUNC = {
    'AutoContrast': autocontrast,
    'Equalize': equalize,
    'Invert': invert,
    'Rotate': rotate,
    'Posterize': posterize,
    'Solarize': solarize,
    'SolarizeAdd': solarize_add,
    'Color': color,
    'Contrast': contrast,
    'Brightness': brightness,
    'Sharpness': sharpness,
    'ShearX': shear_x,
    'ShearY': shear_y,
    'TranslateX': translate_x,
    'TranslateY': translate_y,
    'Identity': lambda image, *a: image,
    'Cutout': cutout,
    'Blur': blur,
    'Smooth': smooth,
    'Rescale': rescale,
}
