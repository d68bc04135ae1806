"""Color jitter ops: HSV roundtrip, jitter determinism, blur."""

import jax
import jax.numpy as jnp
import numpy as np

from sav_tpu.data import color


def sample_image(seed=0, size=16):
    return jax.random.uniform(jax.random.PRNGKey(seed), (size, size, 3),
                              minval=0.0, maxval=255.0)


def test_hsv_roundtrip():
    rgb = np.random.RandomState(0).rand(8, 8, 3).astype(np.float32)
    back = color.hsv_to_rgb(color.rgb_to_hsv(jnp.asarray(rgb)))
    np.testing.assert_allclose(np.asarray(back), rgb, atol=1e-4)


def test_hue_rotation_preserves_value():
    img = sample_image()
    out = color.random_hue(jax.random.PRNGKey(0), img, 0.5)
    # hue rotation preserves the max channel (HSV value)
    np.testing.assert_allclose(np.asarray(out.max(axis=-1)),
                               np.asarray(img.max(axis=-1)), atol=0.5)


def test_color_jitter_deterministic_and_bounded():
    img = sample_image()
    rng = jax.random.PRNGKey(1)
    a = jax.jit(lambda r, im: color.color_jitter(r, im, strength=1.0))(rng,
                                                                       img)
    b = jax.jit(lambda r, im: color.color_jitter(r, im, strength=1.0))(rng,
                                                                       img)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert 0.0 <= float(a.min()) and float(a.max()) <= 255.0
    c = color.color_jitter(jax.random.PRNGKey(2), img, strength=1.0)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_grayscale_prob_one():
    img = sample_image()
    out = color.color_jitter(jax.random.PRNGKey(0), img, strength=0.0,
                             grayscale_prob=1.0)
    arr = np.asarray(out)
    np.testing.assert_allclose(arr[..., 0], arr[..., 1], atol=1e-3)


def test_gaussian_blur_smooths():
    img = jnp.zeros((17, 17, 3)).at[8, 8].set(255.0)
    out = color.gaussian_blur(jax.random.PRNGKey(0), img, kernel_size=5)
    arr = np.asarray(out)
    assert arr[8, 8, 0] < 255.0          # peak spread out
    assert arr[8, 7, 0] > 0.0            # neighbors received mass
    np.testing.assert_allclose(arr.sum(), 255.0 * 3, rtol=0.05)
