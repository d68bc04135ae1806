"""Whole-FF int8 kernel: kernel/twin equality (interpret mode), QAT
backward shape/finiteness, and closeness to the bf16 FF."""

import jax
import jax.numpy as jnp
import numpy as np

from sav_tpu.ops import int8_ff
from sav_tpu.ops.quantized import quantize_symmetric

M, D, F = 70, 64, 256


def _params(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    x = jax.random.normal(ks[0], (M, D), jnp.float32)
    w1 = jax.random.normal(ks[1], (D, F), jnp.float32) / np.sqrt(D)
    b1 = jax.random.normal(ks[2], (F,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (F, D), jnp.float32) / np.sqrt(F)
    b2 = jax.random.normal(ks[4], (D,), jnp.float32) * 0.1
    return x, w1, b1, w2, b2


def test_kernel_matches_jnp_twin():
    x, w1, b1, w2, b2 = _params()
    w1_q, s1 = quantize_symmetric(w1, axis=0)
    w2_q, s2 = quantize_symmetric(w2, axis=0)
    got = int8_ff.int8_ff_raw(x, w1_q, s1, b1, w2_q, s2, b2, block_m=32)
    want = int8_ff.int8_ff_reference(x, w1_q, s1, b1, w2_q, s2, b2,
                                     block_m=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_quantized_ff_close_to_bf16():
    x, w1, b1, w2, b2 = _params()
    got = int8_ff.int8_ff(x, w1, b1, w2, b2)
    want = jax.nn.gelu(x @ w1 + b1) @ w2 + b2
    err = np.asarray(got) - np.asarray(want)
    rms = np.sqrt(np.mean(np.square(np.asarray(want))))
    # two int8 GEMMs: per-element noise ~0.5% RMS; max over the tensor
    # a few sigma higher
    assert np.sqrt(np.mean(np.square(err))) / rms < 0.02
    assert np.abs(err).max() / rms < 0.10, (np.abs(err).max(), rms)


def test_qat_backward_matches_unquantized_grads():
    """STE backward must equal the plain FF's gradients exactly."""
    x, w1, b1, w2, b2 = _params()

    def loss_q(args):
        return jnp.sum(jnp.square(int8_ff.int8_ff(*args)))

    def loss_ref(args):
        x, w1, b1, w2, b2 = args
        return jnp.sum(jnp.square(jax.nn.gelu(x @ w1 + b1) @ w2 + b2))

    gq = jax.grad(loss_q)((x, w1, b1, w2, b2))
    gr = jax.grad(loss_ref)((x, w1, b1, w2, b2))
    # forward outputs differ by quantization noise, so the cotangent
    # g = 2*y differs too; compare direction/scale loosely but shapes and
    # finiteness exactly
    for a, b in zip(gq, gr):
        assert a.shape == b.shape
        assert np.all(np.isfinite(np.asarray(a)))
        cos = (np.vdot(np.asarray(a), np.asarray(b))
               / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos > 0.98, cos


def test_ffblock_ff_mode_tree_output_and_grads():
    """FFBlock(quantized='ff'): identical param tree to the plain block,
    close forward on shared params, and (sum-loss) grads matching the
    plain block's at bf16-residual precision (the backward reads the
    kernel's bf16 hpre store instead of recomputing in f32)."""
    from sav_tpu.nn.feedforward import FFBlock
    base = FFBlock(expand_ratio=4)
    ff = FFBlock(expand_ratio=4, quantized='ff')
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, D), jnp.float32)
    v = base.init(jax.random.PRNGKey(1), x, is_training=False)
    v2 = ff.init(jax.random.PRNGKey(1), x, is_training=False)
    paths = lambda t: {jax.tree_util.keystr(p) for p, _ in
                       jax.tree_util.tree_flatten_with_path(t)[0]}
    assert paths(v) == paths(v2)

    a = np.asarray(base.apply(v, x, is_training=False))
    b = np.asarray(ff.apply(v, x, is_training=False))
    rms = np.sqrt(np.mean(np.square(a)))
    assert np.sqrt(np.mean(np.square(a - b))) / rms < 0.02

    gq = jax.grad(lambda v: jnp.sum(ff.apply(v, x, is_training=False)))(v)
    gr = jax.grad(lambda v: jnp.sum(base.apply(v, x, is_training=False)))(v)
    for pa, pb in zip(jax.tree_util.tree_leaves(gq),
                      jax.tree_util.tree_leaves(gr)):
        a, b = np.asarray(pa, np.float64), np.asarray(pb, np.float64)
        denom = np.abs(b).max() + 1e-12
        assert np.abs(a - b).max() / denom < 0.02, np.abs(a - b).max()


def test_ffblock_ff_mode_rejects_dropout():
    from sav_tpu.nn.feedforward import FFBlock
    import pytest
    ff = FFBlock(expand_ratio=4, dropout_rate=0.1, quantized='ff')
    x = jnp.ones((1, 4, D))
    with pytest.raises(ValueError):
        ff.init(jax.random.PRNGKey(0), x, is_training=False)


def test_ln_sublayer_close_to_unfused_and_grads():
    """int8_ff_sublayer == x + FF(LN(x)) at int8 precision; grads match
    the unquantized span at bf16-residual tolerance."""
    ks = jax.random.split(jax.random.PRNGKey(3), 6)
    x = jax.random.normal(ks[0], (2, 35, D), jnp.float32)
    scale = 1.0 + 0.1 * jax.random.normal(ks[1], (D,))
    bias = 0.1 * jax.random.normal(ks[2], (D,))
    w1 = jax.random.normal(ks[3], (D, F), jnp.float32) / np.sqrt(D)
    b1 = 0.1 * jax.random.normal(ks[4], (F,))
    w2 = jax.random.normal(ks[5], (F, D), jnp.float32) / np.sqrt(F)
    b2 = jnp.zeros((D,))

    def unfused(x, scale, bias, w1, b1, w2, b2):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mu * mu, 0.0)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias
        return x + jax.nn.gelu(y @ w1 + b1) @ w2 + b2

    args = (x, scale, bias, w1, b1, w2, b2)
    got = np.asarray(int8_ff.int8_ff_sublayer(*args))
    want = np.asarray(unfused(*args))
    rms = np.sqrt(np.mean(np.square(want)))
    assert np.sqrt(np.mean(np.square(got - want))) / rms < 0.02

    gq = jax.grad(lambda *a: jnp.sum(jnp.square(
        int8_ff.int8_ff_sublayer(*a))), argnums=tuple(range(7)))(*args)
    gr = jax.grad(lambda *a: jnp.sum(jnp.square(unfused(*a))),
                  argnums=tuple(range(7)))(*args)
    for a, b in zip(gq, gr):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        cos = np.vdot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)
                               + 1e-12)
        assert cos > 0.98, cos


def test_encoder_block_ff_mode_param_tree():
    """ViT EncoderBlock(quantized='ff') keeps the standard param tree
    (checkpoint-interchangeable) and produces close outputs."""
    from sav_tpu.models.vit import EncoderBlock
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64), jnp.float32)
    base = EncoderBlock(num_heads=4, use_kernel=False)
    quant = EncoderBlock(num_heads=4, use_kernel=False, quantized='ff')
    v = base.init(jax.random.PRNGKey(1), x, is_training=False)
    v2 = quant.init(jax.random.PRNGKey(1), x, is_training=False)
    paths = lambda t: {jax.tree_util.keystr(p) for p, _ in
                       jax.tree_util.tree_flatten_with_path(t)[0]}
    assert paths(v) == paths(v2)
    a = np.asarray(base.apply(v, x, is_training=False))
    b = np.asarray(quant.apply(v, x, is_training=False))
    rms = np.sqrt(np.mean(np.square(a)))
    assert np.sqrt(np.mean(np.square(a - b))) / rms < 0.02


def test_batched_shape_roundtrip():
    x, w1, b1, w2, b2 = _params()
    x3 = x.reshape(2, 35, D)
    out = int8_ff.int8_ff(x3, w1, b1, w2, b2)
    assert out.shape == (2, 35, D)


def test_dx_kernel_matches_jnp_twin():
    """SwitchBack dx kernel == its jnp twin bit-for-bit (interpret mode)."""
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    g = jax.random.normal(ks[0], (M, D), jnp.float32) * 0.01
    hpre = jax.random.normal(ks[1], (M, F), jnp.float32)
    w1 = jax.random.normal(ks[2], (D, F), jnp.float32) / np.sqrt(D)
    w2 = jax.random.normal(ks[3], (F, D), jnp.float32) / np.sqrt(F)
    w1t_q, s1t = int8_ff._dx_quantized(w1)
    w2t_q, s2t = int8_ff._dx_quantized(w2)
    dy2, dh = int8_ff.int8_ff_dx_raw(g, hpre.astype(jnp.bfloat16),
                                     w1t_q, s1t, w2t_q, s2t, block_m=32)
    dy2_w, dh_w = int8_ff.int8_ff_dx_reference(
        g, hpre.astype(jnp.bfloat16), w1t_q, s1t, w2t_q, s2t)
    np.testing.assert_allclose(np.asarray(dy2), np.asarray(dy2_w),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dh, np.float32),
                               np.asarray(dh_w, np.float32),
                               rtol=1e-5, atol=1e-6)


def test_switchback_backward_close_to_unquantized_grads():
    """SwitchBack grads stay directionally faithful to the bf16 FF's
    (dx path int8-quantized; dW path exact given the quantized dh)."""
    x, w1, b1, w2, b2 = _params()

    def loss_sb(args):
        return jnp.sum(jnp.square(int8_ff.int8_ff(*args, switchback=True)))

    def loss_ref(args):
        x, w1, b1, w2, b2 = args
        return jnp.sum(jnp.square(jax.nn.gelu(x @ w1 + b1) @ w2 + b2))

    gq = jax.grad(loss_sb)((x, w1, b1, w2, b2))
    gr = jax.grad(loss_ref)((x, w1, b1, w2, b2))
    for a, b in zip(gq, gr):
        assert a.shape == b.shape
        assert np.all(np.isfinite(np.asarray(a)))
        cos = (np.vdot(np.asarray(a, np.float64), np.asarray(b, np.float64))
               / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        assert cos > 0.97, cos


def test_sb_sublayer_forward_matches_ff_sublayer_and_grads():
    """int8_ff_sublayer_sb: identical forward to int8_ff_sublayer (same
    kernel), SwitchBack grads directionally matching the unquantized
    span's."""
    ks = jax.random.split(jax.random.PRNGKey(11), 6)
    x = jax.random.normal(ks[0], (2, 35, D), jnp.float32)
    scale = 1.0 + 0.1 * jax.random.normal(ks[1], (D,))
    bias = 0.1 * jax.random.normal(ks[2], (D,))
    w1 = jax.random.normal(ks[3], (D, F), jnp.float32) / np.sqrt(D)
    b1 = 0.1 * jax.random.normal(ks[4], (F,))
    w2 = jax.random.normal(ks[5], (F, D), jnp.float32) / np.sqrt(F)
    b2 = jnp.zeros((D,))
    args = (x, scale, bias, w1, b1, w2, b2)

    got = np.asarray(int8_ff.int8_ff_sublayer_sb(*args))
    want = np.asarray(int8_ff.int8_ff_sublayer(*args))
    np.testing.assert_array_equal(got, want)

    def unfused(x, scale, bias, w1, b1, w2, b2):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mu * mu, 0.0)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * scale + bias
        return x + jax.nn.gelu(y @ w1 + b1) @ w2 + b2

    gq = jax.grad(lambda *a: jnp.sum(jnp.square(
        int8_ff.int8_ff_sublayer_sb(*a))), argnums=tuple(range(7)))(*args)
    gr = jax.grad(lambda *a: jnp.sum(jnp.square(unfused(*a))),
                  argnums=tuple(range(7)))(*args)
    for a, b in zip(gq, gr):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        cos = np.vdot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)
                               + 1e-12)
        assert cos > 0.97, cos


def test_encoder_block_ff_sb_param_tree_and_train_step():
    """EncoderBlock(quantized='ff_sb'): same param tree as the plain
    block; one SGD step on a toy loss moves every leaf finitely."""
    from sav_tpu.models.vit import EncoderBlock
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64), jnp.float32)
    base = EncoderBlock(num_heads=4, use_kernel=False)
    sb = EncoderBlock(num_heads=4, use_kernel=False, quantized='ff_sb')
    v = base.init(jax.random.PRNGKey(1), x, is_training=False)
    v2 = sb.init(jax.random.PRNGKey(1), x, is_training=False)
    paths = lambda t: {jax.tree_util.keystr(p) for p, _ in
                       jax.tree_util.tree_flatten_with_path(t)[0]}
    assert paths(v) == paths(v2)
    g = jax.grad(lambda v: jnp.sum(jnp.square(
        sb.apply(v, x, is_training=True))))(v)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_attention_sublayer_q8_close_to_bf16():
    """Serving q8 span: int8 projections stay within int8 noise of the
    bf16 fused sublayer; param layout identical (same weight args)."""
    from sav_tpu.ops import fused_layer
    H, d = 4, 64
    dim = H * d
    ks = jax.random.split(jax.random.PRNGKey(5), 7)
    x = jax.random.normal(ks[0], (2, 64, dim), jnp.float32)
    scale = 1.0 + 0.1 * jax.random.normal(ks[1], (dim,))
    bias = 0.1 * jax.random.normal(ks[2], (dim,))
    wq = jax.random.normal(ks[3], (dim, H, d)) / np.sqrt(dim)
    wk = jax.random.normal(ks[4], (dim, H, d)) / np.sqrt(dim)
    wv = jax.random.normal(ks[5], (dim, H, d)) / np.sqrt(dim)
    wo = jax.random.normal(ks[6], (H, d, dim)) / np.sqrt(dim)

    got = np.asarray(fused_layer.attention_sublayer_q8(
        x, scale, bias, wq, wk, wv, wo, H))
    want = np.asarray(fused_layer.attention_sublayer(
        x, scale, bias, wq, wk, wv, wo, H, core='fused'))
    rms = np.sqrt(np.mean(np.square(want)))
    assert np.sqrt(np.mean(np.square(got - want))) / rms < 0.02, \
        np.sqrt(np.mean(np.square(got - want))) / rms


def test_attention_sublayer_q8_fallback_off_geometry():
    """Unsupported geometry (head_d not 64-aligned) falls back to the
    bf16 flash span exactly."""
    from sav_tpu.ops import fused_layer
    H, d = 2, 32          # d % 64 != 0 -> not fused_supported
    dim = H * d
    ks = jax.random.split(jax.random.PRNGKey(6), 5)
    x = jax.random.normal(ks[0], (1, 16, dim), jnp.float32)
    wq = jax.random.normal(ks[1], (dim, H, d)) / np.sqrt(dim)
    wk = jax.random.normal(ks[2], (dim, H, d)) / np.sqrt(dim)
    wv = jax.random.normal(ks[3], (dim, H, d)) / np.sqrt(dim)
    wo = jax.random.normal(ks[4], (H, d, dim)) / np.sqrt(dim)
    one, zero = jnp.ones((dim,)), jnp.zeros((dim,))
    got = np.asarray(fused_layer.attention_sublayer_q8(
        x, one, zero, wq, wk, wv, wo, H))
    want = np.asarray(fused_layer.attention_sublayer(
        x, one, zero, wq, wk, wv, wo, H, core='flash'))
    np.testing.assert_array_equal(got, want)


def test_vit_quantized_all_tree_and_output():
    """ViT(quantized='all', use_kernel='fused'): identical param tree to
    the plain model, output within int8 noise of bf16."""
    from sav_tpu.models import create_model
    base = create_model('vit_s_patch16', num_classes=10,
                        use_kernel='fused')
    q8 = create_model('vit_s_patch16', num_classes=10,
                      use_kernel='fused', quantized='all')
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3),
                          jnp.float32)
    v = base.init(jax.random.PRNGKey(1), x, is_training=False)
    v2 = q8.init(jax.random.PRNGKey(1), x, is_training=False)
    paths = lambda t: {jax.tree_util.keystr(p) for p, _ in
                       jax.tree_util.tree_flatten_with_path(t)[0]}
    assert paths(v) == paths(v2)
    a = np.asarray(base.apply(v, x, is_training=False))
    b = np.asarray(q8.apply(v, x, is_training=False))
    rms = np.sqrt(np.mean(np.square(a))) + 1e-9
    assert np.sqrt(np.mean(np.square(a - b))) / rms < 0.05, \
        np.sqrt(np.mean(np.square(a - b))) / rms


def test_cait_quantized_all_tree_and_output():
    """CaiT(quantized='all', use_kernel='fused_th'): identical param tree
    to the plain model, output within int8 noise. (2 layers — interpret
    mode pays per unrolled layer, and depth adds no new code paths.)"""
    from sav_tpu.models.cait import CaiT
    mk = lambda **kw: CaiT(num_classes=10, num_layers=2,
                           num_layers_token_only=1, num_heads=4,
                           embed_dim=192, patch_shape=(16, 16),
                           stoch_depth_rate=0.0, layerscale_eps=1e-5,
                           use_kernel='fused_th', **kw)
    base = mk()
    q8 = mk(quantized='all')
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3),
                          jnp.float32)
    v = base.init(jax.random.PRNGKey(1), x, is_training=False)
    v2 = q8.init(jax.random.PRNGKey(1), x, is_training=False)
    paths = lambda t: {jax.tree_util.keystr(p) for p, _ in
                       jax.tree_util.tree_flatten_with_path(t)[0]}
    assert paths(v) == paths(v2)
    a = np.asarray(base.apply(v, x, is_training=False))
    b = np.asarray(q8.apply(v, x, is_training=False))
    rms = np.sqrt(np.mean(np.square(a))) + 1e-9
    assert np.sqrt(np.mean(np.square(a - b))) / rms < 0.05, \
        np.sqrt(np.mean(np.square(a - b))) / rms


def test_mixer_quantized_ff_tree_and_output():
    """MLPMixer(quantized='ff'): channel-mix FFs int8, token-mix bf16;
    identical param tree, output within int8 noise."""
    from sav_tpu.models.mlp_mixer import MLPMixer
    mk = lambda **kw: MLPMixer(num_classes=10, num_layers=2,
                               embed_dim=128, patch_shape=(16, 16), **kw)
    base, q8 = mk(), mk(quantized='ff')
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3),
                          jnp.float32)
    v = base.init(jax.random.PRNGKey(1), x, is_training=False)
    v2 = q8.init(jax.random.PRNGKey(1), x, is_training=False)
    paths = lambda t: {jax.tree_util.keystr(p) for p, _ in
                       jax.tree_util.tree_flatten_with_path(t)[0]}
    assert paths(v) == paths(v2)
    a = np.asarray(base.apply(v, x, is_training=False))
    b = np.asarray(q8.apply(v, x, is_training=False))
    rms = np.sqrt(np.mean(np.square(a))) + 1e-9
    assert np.sqrt(np.mean(np.square(a - b))) / rms < 0.05, \
        np.sqrt(np.mean(np.square(a - b))) / rms


def test_cvt_quantized_ff_tree_and_output():
    """CvT(quantized='ff'): FF GEMMs int8 on >=256-ch stages only
    (models/cvt.py gate: embed_dim >= 256 — the 64- and 128-ch stages
    stay bf16; narrower widths measured a loss, docs/PERFORMANCE.md
    round-4); identical param tree, output within int8 noise."""
    from sav_tpu.models.cvt import CvT
    mk = lambda **kw: CvT(num_classes=10, stage_sizes=(1, 1, 2),
                          num_heads=(1, 2, 4), embed_dim=(64, 128, 256),
                          **kw)
    base, q8 = mk(), mk(quantized='ff')
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3),
                          jnp.float32)
    v = base.init(jax.random.PRNGKey(1), x, is_training=False)
    v2 = q8.init(jax.random.PRNGKey(1), x, is_training=False)
    paths = lambda t: {jax.tree_util.keystr(p) for p, _ in
                       jax.tree_util.tree_flatten_with_path(t)[0]}
    assert paths(v) == paths(v2)
    a = np.asarray(base.apply(v, x, is_training=False,
                              mutable=False))
    b = np.asarray(q8.apply(v, x, is_training=False, mutable=False))
    rms = np.sqrt(np.mean(np.square(a))) + 1e-9
    assert np.sqrt(np.mean(np.square(a - b))) / rms < 0.05, \
        np.sqrt(np.mean(np.square(a - b))) / rms


def test_cvt_quantized_gate_is_256ch():
    """Pin the CvT int8 gate value: a 128-ch-max CvT with quantized='ff'
    is BIT-EQUAL to bf16 (no stage quantizes), while a 256-ch stage
    produces int8-noise differences — so the >=256 threshold in
    models/cvt.py is enforced by a test, not just a docstring."""
    from sav_tpu.models.cvt import CvT
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3),
                          jnp.float32)

    def outputs(embed_dim):
        mk = lambda **kw: CvT(num_classes=10, stage_sizes=(1, 1, 1),
                              num_heads=(1, 2, 2), embed_dim=embed_dim,
                              **kw)
        base, q8 = mk(), mk(quantized='ff')
        v = base.init(jax.random.PRNGKey(1), x, is_training=False)
        # the head Dense is zero-init — nudge every param off zero so
        # logits actually reflect the trunk
        leaves, treedef = jax.tree_util.tree_flatten(v)
        ks = jax.random.split(jax.random.PRNGKey(2), len(leaves))
        v = jax.tree_util.tree_unflatten(treedef, [
            p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
            for p, k in zip(leaves, ks)])
        a = np.asarray(base.apply(v, x, is_training=False, mutable=False))
        b = np.asarray(q8.apply(v, x, is_training=False, mutable=False))
        return a, b

    a, b = outputs((32, 64, 128))       # all below the gate
    assert np.array_equal(a, b), 'sub-256-ch stages must stay bf16'
    a, b = outputs((32, 64, 256))       # top stage crosses the gate
    assert not np.array_equal(a, b), '256-ch stage must quantize'


def test_quantized_unsupported_mode_raises():
    """ADVICE r4: quantized=True (predict.py --quantized int8) must not
    silently serve bf16 on families whose gates only honor 'ff'/'all'."""
    import pytest
    from sav_tpu.models.cvt import CvT
    from sav_tpu.models.mlp_mixer import MLPMixer
    x = jnp.ones((1, 32, 32, 3), jnp.float32)
    m = MLPMixer(num_classes=10, num_layers=1, embed_dim=64,
                 patch_shape=(8, 8), quantized=True)
    with pytest.raises(ValueError, match='quantized=True'):
        m.init(jax.random.PRNGKey(0), x, is_training=False)
    c = CvT(num_classes=10, stage_sizes=(1, 1, 1), num_heads=(1, 1, 1),
            embed_dim=(32, 64, 128), quantized='ff_sb')
    with pytest.raises(ValueError, match="quantized='ff_sb'"):
        c.init(jax.random.PRNGKey(0), x, is_training=False)
