"""Experimental int8 matmul: accuracy envelope and STE gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from sav_tpu.ops import quantized


def test_int8_matmul_close_to_f32():
    a = jax.random.normal(jax.random.PRNGKey(0), (64, 128))
    b = jax.random.normal(jax.random.PRNGKey(1), (128, 96))
    got = np.asarray(quantized.int8_matmul(a, b))
    want = np.asarray(a @ b)
    # dynamic symmetric int8: ~1.5% mean relative error at these shapes
    rel = np.abs(got - want) / (np.abs(want) + 1.0)
    assert rel.mean() < 0.025, rel.mean()


def test_quantize_roundtrip_scale():
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 32)) * 5.0
    q, scale = quantized.quantize_symmetric(x, axis=1)
    back = np.asarray(q.astype(jnp.float32) * scale)
    np.testing.assert_allclose(back, np.asarray(x), atol=np.asarray(
        scale).max() * 0.51)
    assert q.dtype == jnp.int8


def test_ste_gradients_match_f32():
    a = jax.random.normal(jax.random.PRNGKey(0), (16, 32))
    b = jax.random.normal(jax.random.PRNGKey(1), (32, 8))

    ga_q, gb_q = jax.grad(
        lambda a, b: jnp.sum(jnp.tanh(quantized.int8_matmul(a, b))),
        argnums=(0, 1))(a, b)
    ga_f, gb_f = jax.grad(
        lambda a, b: jnp.sum(jnp.tanh(a @ b)), argnums=(0, 1))(a, b)
    # STE: same gradient formula; small diff from the fwd quantization
    # error flowing through tanh'
    np.testing.assert_allclose(np.asarray(ga_q), np.asarray(ga_f), atol=0.2)
    np.testing.assert_allclose(np.asarray(gb_q), np.asarray(gb_f), atol=0.2)


def test_quantized_dense_shapes():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 32), jnp.bfloat16)
    kernel = jax.random.normal(jax.random.PRNGKey(1), (32, 16))
    bias = jnp.ones((16,))
    out = quantized.quantized_dense(x, kernel, bias)
    assert out.shape == (2, 7, 16)
    assert out.dtype == jnp.bfloat16


def test_vit_quantized_tree_and_output():
    """quantized=True keeps the exact param tree and stays numerically close
    on the forward pass."""
    from sav_tpu.models import ViT
    kwargs = dict(num_classes=10, num_layers=2, num_heads=4, embed_dim=64,
                  patch_shape=(16, 16))
    base = ViT(**kwargs)
    quant = ViT(**kwargs, quantized=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))

    v_base = base.init(jax.random.PRNGKey(1), x, is_training=False)
    v_quant = quant.init(jax.random.PRNGKey(1), x, is_training=False)
    paths = lambda v: {jax.tree_util.keystr(p) for p, _ in
                       jax.tree_util.tree_flatten_with_path(v)[0]}
    assert paths(v_base) == paths(v_quant)

    # the classifier head is zero-init; randomize it so logits carry signal
    head = v_base['params']['Dense_0']
    head['kernel'] = jax.random.normal(jax.random.PRNGKey(2),
                                       head['kernel'].shape) * 0.1

    a = base.apply(v_base, x, is_training=False)
    b = quant.apply(v_base, x, is_training=False)  # same params
    # int8 forward: close but not equal
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() < 0.5


def test_fused_kernel_matches_blockwise_reference():
    """Pallas kernel == its jnp twin.

    Tolerance is one f32 ulp of the epilogue products: the interpreter
    reassociates the two scale multiplications (measured 7.6e-6 max abs on
    O(50) outputs); the compiled TPU kernel matches the twin bit-exactly.
    The int8 quantization and int32 accumulation are exact in both.
    """
    from sav_tpu.ops import int8_matmul_kernel as k
    rng = jax.random.PRNGKey(0)
    # uneven sizes exercise the padding paths
    a = jax.random.normal(rng, (300, 200), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (200, 130), jnp.float32)
    b_q, b_scale = quantized.quantize_symmetric(b, axis=0)
    out = k.int8_matmul_fused_raw(a, b_q, b_scale)
    ref = k.blockwise_int8_matmul_reference(a, b_q, b_scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-7, atol=3e-5)


def test_fused_kernel_close_to_f32_matmul():
    from sav_tpu.ops import int8_matmul_kernel as k
    a = jax.random.normal(jax.random.PRNGKey(0), (256, 512), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (512, 256), jnp.float32)
    b_q, b_scale = quantized.quantize_symmetric(b, axis=0)
    out = np.asarray(k.int8_matmul_fused_raw(a, b_q, b_scale))
    exact = np.asarray(a @ b)
    # int8 quantization error: ~1% relative on the output scale
    err = np.abs(out - exact) / (np.abs(exact).mean() + 1e-6)
    assert err.mean() < 0.02, err.mean()


def test_fused_dense_ste_gradients_match_f32():
    from sav_tpu.ops.int8_matmul_kernel import int8_dense_fused
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 24, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (64, 32), jnp.float32)

    gx, gw = jax.grad(
        lambda x, w: int8_dense_fused(x, w).sum(), argnums=(0, 1))(x, w)
    ex, ew = jax.grad(
        lambda x, w: (x.reshape(-1, 64) @ w).sum(), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx),
                               np.asarray(ex).reshape(x.shape), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ew), rtol=1e-5)


def test_fused_dense_bf16_path():
    from sav_tpu.ops.int8_matmul_kernel import int8_dense_fused
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 128), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (128, 64), jnp.float32)
    out = int8_dense_fused(x, w, bias=jnp.ones((64,), jnp.bfloat16))
    assert out.dtype == jnp.bfloat16 and out.shape == (8, 64)
    assert np.isfinite(np.asarray(out, np.float32)).all()
