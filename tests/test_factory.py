"""create_model factory: all 29 reference names resolve to the right configs."""

import jax.numpy as jnp
import pytest

from sav_tpu import create_model, available_models
from sav_tpu.models import BoTNet, CaiT, CeiT, CvT, MLPMixer, TNT, ViT

EXPECTED_NAMES = {
    'vit_b_patch32', 'vit_b_patch16', 'vit_l_patch32', 'vit_l_patch16',
    'botnet_t3', 'botnet_t4', 'botnet_t5',
    'tnt_s_patch16', 'tnt_b_patch16',
    'ceit_t', 'ceit_s', 'ceit_b',
    'cait_xxs_24', 'cait_xxs_36', 'cait_xs_24', 'cait_xs_36',
    'cait_s_24', 'cait_s_36', 'cait_s_48',
    'cait_m_24', 'cait_m_36', 'cait_m_48',
    'cvt-13', 'cvt-21', 'cvt-w24',
    'mixer_s_patch32', 'mixer_s_patch16', 'mixer_b_patch32',
    'mixer_b_patch16', 'mixer_l_patch32', 'mixer_l_patch16',
}


def test_all_names_present():
    # every reference name must resolve; extensions (vit_ti/vit_s) may exist
    assert EXPECTED_NAMES <= set(available_models())


def test_unknown_name_raises():
    with pytest.raises(RuntimeError, match='Model not found'):
        create_model('vit_xxl_patch2')


def test_classes_and_passthrough():
    model = create_model('vit_b_patch16', num_classes=10, dtype=jnp.bfloat16)
    assert isinstance(model, ViT)
    assert model.num_classes == 10
    assert model.dtype == jnp.bfloat16
    assert model.num_layers == 12 and model.embed_dim == 768
    assert model.patch_shape == (16, 16)

    assert isinstance(create_model('cait_s_24'), CaiT)
    assert isinstance(create_model('ceit_t'), CeiT)
    assert isinstance(create_model('cvt-13'), CvT)
    assert isinstance(create_model('tnt_s_patch16'), TNT)
    assert isinstance(create_model('botnet_t3'), BoTNet)
    assert isinstance(create_model('mixer_b_patch16'), MLPMixer)


def test_reference_factory_bugs_fixed():
    # CvT stage-3 width is the paper/test value, not the reference's 368.
    assert create_model('cvt-13').embed_dim == (64, 192, 384)
    # TNT small/base dims un-swapped (paper + reference tnt_test.py values).
    tnt_s = create_model('tnt_s_patch16')
    assert (tnt_s.inner_embed_dim, tnt_s.outer_embed_dim) == (24, 384)
    assert tnt_s.outer_num_heads == 6
    tnt_b = create_model('tnt_b_patch16')
    assert (tnt_b.inner_embed_dim, tnt_b.outer_embed_dim) == (40, 640)
    assert tnt_b.outer_num_heads == 10
    # mixer_b_patch16 exists (dead duplicate branch in the reference).
    mixer_b = create_model('mixer_b_patch16')
    assert mixer_b.num_layers == 12 and mixer_b.embed_dim == 768


def test_overrides():
    model = create_model('vit_b_patch16', use_kernel=False)
    assert model.use_kernel is False


def test_unsupported_override_raises_clearly():
    import pytest as _pytest

    from sav_tpu.models import factory
    with _pytest.raises(RuntimeError, match='does not support quantized'):
        factory.create_model('tnt_s_patch16', quantized='ff')
    # CaiT gained int8 serving support, so the same override must build.
    assert factory.create_model('cait_s_24', quantized='ff') is not None
