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


@pytest.mark.slow
def test_cait_s24_factory_parity():
    """Tracked config at full factory width (reduced image size).

    The reference factory path works for CaiT, so this exercises both
    factories end to end (reference: create_model.py:109-123)."""
    ref = reference_models.create_model('cait_s_24', num_classes=1000)
    ours = sav_tpu.create_model('cait_s_24', num_classes=1000)
    _parity_check(ref, ours, 64)


@pytest.mark.slow
@pytest.mark.parametrize('name,img', [
    ('mixer_b_patch16', 96),
    ('cvt-13', 64),
    ('tnt_s_patch16', 48),
])
def test_tracked_config_model_parity(name, img):
    """Remaining BASELINE.json tracked configs at full factory width.

    The reference *factory* cannot produce these as documented fixes
    (create_model.py:50-63 swaps TNT s/b, :173 uses 368 for CvT stage 3,
    :184/199 shadows mixer_b_patch16), so the reference MODEL CLASS is
    instantiated with our corrected config: this proves the model code is
    numerically identical at full width, which is what checkpoint drop-in
    requires."""
    from sav_tpu.models import factory

    ours = sav_tpu.create_model(name, num_classes=1000)
    _, kwargs = factory.MODEL_CONFIGS[name]
    ref_cls = getattr(reference_models, type(ours).__name__)
    ref = ref_cls(num_classes=1000, **kwargs)
    _parity_check(ref, ours, img)


def test_botnet_param_tree_parity():
    """BoTNet checkpoint compatibility vs the reference.

    The reference BoTNet forward cannot run as published — it crashes on
    undefined ``self.head_dim`` (botnet.py:185), a nonexistent
    ``self.config`` (botnet.py:227,232), and SqueezeExcite calling the
    pooled tensor (squeeze_excite.py:32-33). This test applies exactly those
    three MINIMAL fixes to the reference source in memory (documented below)
    and then asserts our model produces an identical parameter/batch-stats
    tree, i.e. reference-shaped BoTNet checkpoints drop in.

    Logits are intentionally NOT compared: even after the crash fixes, the
    reference softmaxes over the last axis only and contracts the values
    with an einsum that drops the key grid (botnet.py:194,198-200) — not
    attention as published in the BoTNet paper. Our implementation follows
    the paper; "reference numerics" are undefined here (SURVEY §7 item 6).
    """
    import inspect

    import models.botnet as ref_botnet
    import models.layers.squeeze_excite as ref_se

    se_src = inspect.getsource(ref_se)
    # fix 1: drop the spurious call of the pooled tensor
    se_src = se_src.replace('keepdims=True)(inputs)', 'keepdims=True)')
    assert 'keepdims=True)(inputs)' not in se_src
    se_ns = {}
    exec(compile(se_src, ref_se.__file__ + ' (patched)', 'exec'), se_ns)

    bot_src = inspect.getsource(ref_botnet)
    # fix 2: the attribute is head_ch (botnet.py:150), not head_dim
    bot_src = bot_src.replace('jnp.sqrt(self.head_dim)',
                              'jnp.sqrt(self.head_ch)')
    # fix 3: BoTMHSA takes num_heads/head_ch, not the removed config object;
    # 4 heads is the BoTNet class default (botnet.py:265)
    bot_src = bot_src.replace('cfg = self.config\n', '')
    bot_src = bot_src.replace(
        'BoTMHSA(config=cfg)',
        'BoTMHSA(num_heads=4, head_ch=self.filters // 4)')
    bot_ns = {}
    exec(compile(bot_src, ref_botnet.__file__ + ' (patched)', 'exec'),
         bot_ns)
    bot_ns['SqueezeExciteBlock'] = se_ns['SqueezeExciteBlock']

    kwargs = dict(num_classes=10, stage_sizes=(1, 1, 1, 1))
    ref_model = bot_ns['BoTNet'](**kwargs)
    our_model = sav_tpu.BoTNet(**kwargs)

    x = jnp.ones((2, 64, 64, 3), jnp.float32)
    ref_variables = ref_model.init(jax.random.PRNGKey(0), x, train=False)
    our_variables = our_model.init(jax.random.PRNGKey(0), x,
                                   is_training=False)

    ref_tree = {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_flatten_with_path(ref_variables)[0]}
    our_tree = {jax.tree_util.keystr(p): v.shape for p, v in
                jax.tree_util.tree_flatten_with_path(our_variables)[0]}
    assert ref_tree == our_tree, (
        f'only ref: {sorted(set(ref_tree) - set(our_tree))}\n'
        f'only ours: {sorted(set(our_tree) - set(ref_tree))}\n'
        f'shape diffs: '
        f'{ {k: (ref_tree[k], our_tree[k]) for k in ref_tree if k in our_tree and ref_tree[k] != our_tree[k]} }')
