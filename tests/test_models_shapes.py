"""Per-model forward shape tests on small inputs (reference test strategy:
models/*_test.py — parameterized init_with_output + chex.assert_shape)."""

import chex
import jax
import jax.numpy as jnp
import pytest

from sav_tpu.models import BoTNet, CaiT, CeiT, CvT, MLPMixer, TNT, ViT

BATCH = 2
NUM_CLASSES = 10


def forward(model, image_size, is_training=False, extra_rngs=()):
    rng = jax.random.PRNGKey(0)
    rngs = {'params': rng}
    for i, name in enumerate(extra_rngs):
        rngs[name] = jax.random.PRNGKey(i + 1)
    x = jnp.ones((BATCH, image_size, image_size, 3))
    logits, _ = model.init_with_output(rngs, x, is_training=is_training)
    return logits


def test_vit():
    model = ViT(num_classes=NUM_CLASSES, num_layers=2, num_heads=4,
                embed_dim=64, patch_shape=(16, 16))
    chex.assert_shape(forward(model, 64), (BATCH, NUM_CLASSES))


def test_cait_eval_and_train():
    model = CaiT(num_classes=NUM_CLASSES, num_layers=2,
                 num_layers_token_only=2, num_heads=4, embed_dim=64,
                 patch_shape=(16, 16), stoch_depth_rate=0.1,
                 layerscale_eps=1e-5)
    chex.assert_shape(forward(model, 64), (BATCH, NUM_CLASSES))
    # Training mode exercises the stochastic-depth RNG stream — the
    # reference could never run this path (SURVEY §3.4).
    logits = forward(model, 64, is_training=True,
                     extra_rngs=('stochastic_depth', 'dropout'))
    chex.assert_shape(logits, (BATCH, NUM_CLASSES))


def test_ceit():
    model = CeiT(num_classes=NUM_CLASSES, num_layers=2, num_heads=4,
                 embed_dim=64)
    chex.assert_shape(forward(model, 32), (BATCH, NUM_CLASSES))


def test_cvt():
    model = CvT(num_classes=NUM_CLASSES, stage_sizes=(1, 1, 2),
                num_heads=(1, 2, 4), embed_dim=(16, 32, 64))
    chex.assert_shape(forward(model, 32), (BATCH, NUM_CLASSES))


def test_tnt():
    model = TNT(num_classes=NUM_CLASSES, num_layers=2, inner_num_heads=2,
                outer_num_heads=4, inner_embed_dim=16, outer_embed_dim=64)
    chex.assert_shape(forward(model, 32), (BATCH, NUM_CLASSES))


def test_botnet():
    model = BoTNet(num_classes=NUM_CLASSES, stage_sizes=(1, 1, 1, 1))
    chex.assert_shape(forward(model, 64), (BATCH, NUM_CLASSES))


def test_botnet_384_grid():
    """384 input — the top of the reference's own resolution sweep
    (botnet_test.py:13-23). Exercises the de-materialized rel-pos bias on
    the 24x24 attention grid with real numerics."""
    model = BoTNet(num_classes=NUM_CLASSES, stage_sizes=(1, 1, 1, 1))
    chex.assert_shape(forward(model, 384), (BATCH, NUM_CLASSES))


def test_botnet_t5_384_shapes_abstract():
    """Factory-width botnet_t5 @384 init+apply, traced abstractly (the full
    forward is a CPU-test budget problem; the TPU run is benchmarked)."""
    import functools
    from sav_tpu.models import create_model
    model = create_model('botnet_t5', num_classes=1000)
    x = jax.ShapeDtypeStruct((2, 384, 384, 3), jnp.float32)
    variables = jax.eval_shape(
        functools.partial(model.init, is_training=False),
        jax.random.PRNGKey(0), x)
    out = jax.eval_shape(
        functools.partial(model.apply, is_training=False), variables, x)
    assert out.shape == (2, 1000)


def test_mlp_mixer():
    model = MLPMixer(num_classes=NUM_CLASSES, num_layers=2, embed_dim=64,
                     patch_shape=(16, 16))
    chex.assert_shape(forward(model, 64), (BATCH, NUM_CLASSES))


@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_vit_dtype(dtype):
    model = ViT(num_classes=NUM_CLASSES, num_layers=1, num_heads=2,
                embed_dim=32, patch_shape=(16, 16), dtype=dtype)
    logits = forward(model, 32)
    assert logits.dtype == dtype


def test_batchnorm_models_mutate_stats_in_training():
    """CvT/CeiT-style models must update batch_stats when training — the
    reference silently dropped them (SURVEY §7 hard part 3)."""
    model = CeiT(num_classes=NUM_CLASSES, num_layers=1, num_heads=2,
                 embed_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1), x, is_training=False)
    assert 'batch_stats' in variables
    _, updates = model.apply(variables, x, is_training=True,
                             mutable=['batch_stats'])
    old = jax.tree_util.tree_leaves(variables['batch_stats'])
    new = jax.tree_util.tree_leaves(updates['batch_stats'])
    assert any(not jnp.allclose(a, b) for a, b in zip(old, new))
