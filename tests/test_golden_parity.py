"""Golden-logit parity vs the reference implementation.

Imports the reference package (read-only, at /root/reference), initializes
each reference model, and applies *our* model with the *reference's*
parameters: identical param trees and logits within tight float32 tolerance
prove functional parity (BASELINE.json: logits within 1e-3).

BoTNet is excluded: the reference forward crashes (botnet.py:185,227) so no
reference numerics exist for it (SURVEY §7 hard part 6).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE_ROOT = '/root/reference'
if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

import models as reference_models  # noqa: E402  (the reference package)

import sav_tpu  # noqa: E402

TOL = dict(atol=1e-5, rtol=1e-5)


def _parity_check(ref_model, our_model, image_size, seed=0):
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(jax.random.PRNGKey(seed + 100),
                          (2, image_size, image_size, 3), dtype=jnp.float32)

    ref_variables = ref_model.init(rng, jnp.ones_like(x), is_training=False)
    our_variables = our_model.init(rng, jnp.ones_like(x), is_training=False)

    ref_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(
                     ref_variables)[0]}
    our_paths = {jax.tree_util.keystr(p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(
                     our_variables)[0]}
    assert ref_paths == our_paths, (
        f'param tree mismatch:\nonly ref: {sorted(ref_paths - our_paths)}\n'
        f'only ours: {sorted(our_paths - ref_paths)}')

    ref_logits = ref_model.apply(ref_variables, x, is_training=False)
    our_logits = our_model.apply(ref_variables, x, is_training=False)
    np.testing.assert_allclose(np.asarray(our_logits),
                               np.asarray(ref_logits), **TOL)


def test_vit_parity():
    kwargs = dict(num_classes=10, num_layers=2, num_heads=4, embed_dim=64,
                  patch_shape=(16, 16))
    _parity_check(reference_models.ViT(**kwargs), sav_tpu.ViT(**kwargs), 64)


def test_cait_parity():
    kwargs = dict(num_classes=10, num_layers=2, num_layers_token_only=2,
                  num_heads=4, embed_dim=64, patch_shape=(16, 16),
                  stoch_depth_rate=0.1, layerscale_eps=1e-5)
    _parity_check(reference_models.CaiT(**kwargs), sav_tpu.CaiT(**kwargs), 64)


def test_ceit_parity():
    kwargs = dict(num_classes=10, num_layers=2, num_heads=4, embed_dim=64)
    _parity_check(reference_models.CeiT(**kwargs), sav_tpu.CeiT(**kwargs), 32)


def test_cvt_parity():
    kwargs = dict(num_classes=10, stage_sizes=(1, 1, 2), num_heads=(1, 2, 4),
                  embed_dim=(16, 32, 64))
    _parity_check(reference_models.CvT(**kwargs), sav_tpu.CvT(**kwargs), 32)


def test_tnt_parity():
    kwargs = dict(num_classes=10, num_layers=2, inner_num_heads=2,
                  outer_num_heads=4, inner_embed_dim=16, outer_embed_dim=64)
    _parity_check(reference_models.TNT(**kwargs), sav_tpu.TNT(**kwargs), 32)


def test_mlp_mixer_parity():
    kwargs = dict(num_classes=10, num_layers=2, embed_dim=64,
                  patch_shape=(16, 16))
    _parity_check(reference_models.MLPMixer(**kwargs),
                  sav_tpu.MLPMixer(**kwargs), 64)


@pytest.mark.slow
def test_vit_b_patch16_factory_parity():
    """Full-size flagship config at reduced image size."""
    ref = reference_models.create_model('vit_b_patch16', num_classes=1000)
    ours = sav_tpu.create_model('vit_b_patch16', num_classes=1000)
    _parity_check(ref, ours, 96)
