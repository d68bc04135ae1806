"""Layer-library unit tests: attention math, talking heads, stochastic depth,
squeeze-excite, rotary embeddings, patchify."""

import chex
import jax
import jax.numpy as jnp
import numpy as np

from sav_tpu import nn as blocks
from sav_tpu.ops import attention as attention_ops


def test_multi_head_attention_matches_naive():
    rng = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (2, 7, 3, 8))
               for i in range(3))
    out = attention_ops.multi_head_attention(q, k, v, use_kernel=False)

    # naive: per-head softmax(q k^T / sqrt(d)) v
    scaled = q / np.sqrt(8)
    logits = jnp.einsum('bqhd,bkhd->bhqk', scaled, k)
    weights = jax.nn.softmax(logits)
    expected = jnp.einsum('bhqk,bkhd->bqhd', weights, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=1e-6)


def test_head_mix_is_linear_head_combination():
    weights = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 5, 5))
    transform = jax.random.normal(jax.random.PRNGKey(1), (3, 3))
    with jax.default_matmul_precision('highest'):
        mixed = attention_ops.head_mix(weights, transform)
    expected = jnp.stack(
        [sum(transform[h, i] * weights[:, h] for h in range(3))
         for i in range(3)], axis=1)
    np.testing.assert_allclose(np.asarray(mixed), np.asarray(expected),
                               atol=1e-5)


def test_attention_block_shapes_and_cross_attention():
    block = blocks.AttentionBlock(num_heads=4)
    q = jnp.ones((2, 5, 32))
    kv = jnp.ones((2, 9, 32))
    out, _ = block.init_with_output(jax.random.PRNGKey(0), q, kv,
                                    is_training=False)
    chex.assert_shape(out, (2, 5, 32))


def test_talking_heads_param_and_apply():
    block = blocks.TalkingHeadsBlock(num_heads=4)
    weights = jnp.ones((2, 4, 3, 3))
    out, variables = block.init_with_output(jax.random.PRNGKey(0), weights)
    chex.assert_shape(out, (2, 4, 3, 3))
    transform = variables['params']['talking_heads_transform']
    chex.assert_shape(transform, (4, 4))
    # orthogonal init (check in numpy: backend matmul precision varies)
    t = np.asarray(transform)
    np.testing.assert_allclose(t @ t.T, np.eye(4), atol=1e-5)
    # no-arg call returns the matrix itself
    got = block.apply(variables)
    np.testing.assert_allclose(np.asarray(got), np.asarray(transform))


def test_stochastic_depth_train_eval():
    block = blocks.StochasticDepthBlock(drop_rate=0.5)
    x = jnp.ones((512, 4, 4))
    # eval: identity
    out = block.apply({}, x, is_training=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))
    # train: rows are either 0 or 1/keep_prob, roughly half each
    out = block.apply({}, x, is_training=True,
                      rngs={'stochastic_depth': jax.random.PRNGKey(0)})
    row_means = np.asarray(out.mean(axis=(1, 2)))
    assert set(np.round(np.unique(row_means), 4)) <= {0.0, 2.0}
    assert 0.3 < (row_means > 0).mean() < 0.7
    # scale_by_keep=False leaves kept rows unscaled (reference crashed here)
    block = blocks.StochasticDepthBlock(drop_rate=0.5, scale_by_keep=False)
    out = block.apply({}, x, is_training=True,
                      rngs={'stochastic_depth': jax.random.PRNGKey(0)})
    assert set(np.round(np.unique(np.asarray(out)), 4)) <= {0.0, 1.0}


def test_squeeze_excite():
    block = blocks.SqueezeExciteBlock(se_ratio=0.25)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    out, _ = block.init_with_output(jax.random.PRNGKey(1), x)
    chex.assert_shape(out, (2, 8, 8, 16))
    # gate is in (0, 1): |out| <= |x|
    assert np.all(np.abs(np.asarray(out)) <= np.abs(np.asarray(x)) + 1e-6)


def test_rotary_preserves_norm_and_relativity():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    rotated = blocks.RotaryPositionalEmbedding().apply({}, x)
    # rotation preserves per-pair norms -> per-token norm
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1),
        np.linalg.norm(np.asarray(rotated), axis=-1), rtol=1e-5)
    # dot products depend only on the relative offset (checked with the
    # same vector at every position so content cancels out)
    v = jnp.tile(x[:, :1, :], (1, 10, 1))
    q = blocks.RotaryPositionalEmbedding().apply({}, v)
    dots = np.asarray(jnp.einsum('bld,bmd->blm', q, q))
    np.testing.assert_allclose(dots[0, 2, 4], dots[0, 3, 5], rtol=2e-3)
    assert not np.allclose(dots[0, 2, 4], dots[0, 2, 5], rtol=0.1)


def test_fixed_positional_embedding_changes_with_position():
    x = jnp.zeros((1, 6, 8))
    out = blocks.FixedPositionalEmbedding().apply({}, x)
    assert not np.allclose(np.asarray(out[0, 0]), np.asarray(out[0, 3]))


def test_patchify_layout():
    # 1x4x4x1 image, 2x2 patches: row-major patch order, (ph pw c) features
    img = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    patches = blocks.patchify(img, (2, 2))
    chex.assert_shape(patches, (1, 4, 4))
    np.testing.assert_array_equal(np.asarray(patches[0, 0]), [0, 1, 4, 5])
    np.testing.assert_array_equal(np.asarray(patches[0, 3]), [10, 11, 14, 15])


def test_layer_scale():
    block = blocks.LayerScaleBlock(eps=1e-4)
    x = jnp.ones((2, 3, 8))
    out, variables = block.init_with_output(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(out), 1e-4 * np.ones((2, 3, 8)),
                               rtol=1e-6)


def test_fused_qkv_matches_unfused():
    """fused_qkv=True (one wide matmul) must equal the DenseGeneral path,
    for self-attention and cross-attention, with and without bias."""
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 16))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16))
    for use_bias in (False, True):
        unfused = blocks.AttentionBlock(num_heads=4, use_bias=use_bias,
                                        fused_qkv=False, use_kernel=False)
        fused = blocks.AttentionBlock(num_heads=4, use_bias=use_bias,
                                      fused_qkv=True, use_kernel=False)
        variables = unfused.init(jax.random.PRNGKey(2), x, x,
                                 is_training=False)
        fused_variables = fused.init(jax.random.PRNGKey(2), x, x,
                                     is_training=False)
        # identical param trees (checkpoint compatibility)
        chex.assert_trees_all_equal_shapes(variables, fused_variables)

        for kv in (x, ctx):  # self- and cross-attention
            a = unfused.apply(variables, x, kv, is_training=False)
            b = fused.apply(variables, x, kv, is_training=False)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


def test_one_query_squeezed_path_matches_generic():
    """The q_len==1 class-attention fast path (CaiT/CeiT heads) must equal
    the generic 4-D attention math, values and gradients."""
    import numpy as np
    from sav_tpu.ops import attention as attention_ops

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 1, 4, 16), jnp.float32)
    k = jnp.asarray(rng.randn(2, 9, 4, 16), jnp.float32)
    v = jnp.asarray(rng.randn(2, 9, 4, 16), jnp.float32)

    def generic(q, k, v):
        scaled = q / jnp.sqrt(q.shape[-1]).astype(q.dtype)
        w = attention_ops.attention_weights(scaled, k)
        return jnp.einsum('...hqk,...khd->...qhd', w, v)

    def fast(q, k, v):
        return attention_ops.multi_head_attention(q, k, v,
                                                  use_kernel=False)

    np.testing.assert_allclose(np.asarray(fast(q, k, v)),
                               np.asarray(generic(q, k, v)),
                               atol=1e-6, rtol=1e-6)
    g_fast = jax.grad(lambda *a: jnp.sum(fast(*a) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
    g_gen = jax.grad(lambda *a: jnp.sum(generic(*a) ** 2),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fast, g_gen):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
