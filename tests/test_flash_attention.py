"""Flash-attention kernel vs jnp reference: forward and gradients.

Runs the Pallas kernels in interpreter mode on CPU (the same code path
compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sav_tpu.ops import attention as attention_ops
from sav_tpu.ops import flash_attention


def make_qkv(q_len, kv_len, heads, dim, batch=2, seed=0, dtype=jnp.float32):
    rngs = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(rngs[0], (batch, q_len, heads, dim), dtype)
    k = jax.random.normal(rngs[1], (batch, kv_len, heads, dim), dtype)
    v = jax.random.normal(rngs[2], (batch, kv_len, heads, dim), dtype)
    return q, k, v


def reference(q, k, v):
    return attention_ops.multi_head_attention(q, k, v, use_kernel=False)


def kernel(q, k, v):
    return attention_ops.multi_head_attention(q, k, v, use_kernel=True)


@pytest.mark.parametrize('q_len,kv_len,heads,dim', [
    (197, 197, 4, 64),     # ViT-ish: non-multiple-of-128 seq, single block
    (128, 128, 2, 128),    # exact block fit, wide heads
    (256, 640, 2, 64),     # cross-attention, ragged kv single block
    (640, 1400, 2, 64),    # multi q- and k-block online-softmax path
])
def test_forward_matches_reference(q_len, kv_len, heads, dim):
    q, k, v = make_qkv(q_len, kv_len, heads, dim)
    with jax.default_matmul_precision('highest'):
        got = np.asarray(kernel(q, k, v))
        want = np.asarray(reference(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_supported_predicate():
    q, k, v = make_qkv(197, 197, 4, 64)
    assert flash_attention.shape_supported(q, k, v)
    assert not flash_attention.shape_supported(q, k, v, dropout_rate=0.1)
    assert not flash_attention.shape_supported(q, k, v,
                                               bias=jnp.zeros(()))
    short_q = q[:, :8]
    # 1-query class attention stays on the jnp path
    assert not flash_attention.shape_supported(short_q, k, v)
    # auto dispatch never engages off-TPU
    if jax.default_backend() != 'tpu':
        assert not flash_attention.supported(q, k, v)


@pytest.mark.parametrize('q_len,kv_len', [
    (197, 197),            # single-block fast path
    (640, 1400),           # multi-block accumulation path
])
def test_gradients_match_reference(q_len, kv_len):
    q, k, v = make_qkv(q_len, kv_len, 2, 64, batch=1)

    def loss(fn, q, k, v):
        out = fn(q, k, v)
        return jnp.sum(out * jnp.cos(out.astype(jnp.float32)))

    with jax.default_matmul_precision('highest'):
        g_ref = jax.grad(lambda *a: loss(reference, *a), argnums=(0, 1, 2))(
            q, k, v)
        g_ker = jax.grad(lambda *a: loss(kernel, *a), argnums=(0, 1, 2))(
            q, k, v)
    for a, b, name in zip(g_ker, g_ref, 'qkv'):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4,
                                   err_msg=f'd{name} mismatch')


def test_bf16_forward_close():
    q, k, v = make_qkv(128, 128, 2, 64, dtype=jnp.bfloat16)
    out_k = kernel(q, k, v).astype(jnp.float32)
    out_r = reference(q.astype(jnp.float32), k.astype(jnp.float32),
                      v.astype(jnp.float32))
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=2e-2, rtol=2e-2)


def hybrid(q, k, v):
    return attention_ops.multi_head_attention(q, k, v, use_kernel='hybrid')


@pytest.mark.parametrize('q_len,kv_len', [(197, 197), (130, 250)])
def test_hybrid_matches_reference(q_len, kv_len):
    q, k, v = make_qkv(q_len, kv_len, 4, 64)
    with jax.default_matmul_precision('highest'):
        got = np.asarray(hybrid(q, k, v))
        want = np.asarray(reference(q, k, v))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_hybrid_gradients_match_reference():
    q, k, v = make_qkv(197, 197, 2, 64, batch=1)

    def loss(fn, q, k, v):
        out = fn(q, k, v)
        return jnp.sum(out * jnp.cos(out.astype(jnp.float32)))

    with jax.default_matmul_precision('highest'):
        g_ref = jax.grad(lambda *a: loss(reference, *a),
                         argnums=(0, 1, 2))(q, k, v)
        g_hyb = jax.grad(lambda *a: loss(hybrid, *a),
                         argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_hyb, g_ref, 'qkv'):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-4,
                                   err_msg=f'd{name} mismatch')


@pytest.mark.parametrize('mode', [True, 'hybrid'])
def test_vit_forward_with_forced_kernel_paths(mode):
    """Model-level integration: forcing kernel/hybrid attention inside ViT
    matches the jnp path (interpret mode on CPU)."""
    from sav_tpu.models import ViT
    kwargs = dict(num_classes=10, num_layers=1, num_heads=2, embed_dim=64,
                  patch_shape=(16, 16))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 128, 3))
    base = ViT(**kwargs, use_kernel=False)
    variables = base.init(jax.random.PRNGKey(1), x, is_training=False)
    # randomize the zero-init head so logits carry signal
    variables['params']['Dense_0']['kernel'] = jax.random.normal(
        jax.random.PRNGKey(2),
        variables['params']['Dense_0']['kernel'].shape) * 0.1

    want = base.apply(variables, x, is_training=False)
    got = ViT(**kwargs, use_kernel=mode).apply(variables, x,
                                               is_training=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-3, rtol=2e-3)


def test_block_sizes_fit_budget_and_prefer_single_kv():
    """Block picker invariants (rounds 2-3, docs/PERFORMANCE.md):
    sublane-aligned q blocks, 128-aligned kv blocks, single kv block
    whenever the footprint allows. Tiles either fit the 16 MB-default
    budget, or are a SINGLE block per direction in the raised-vmem-limit
    regime (round 3) under its cap."""
    from sav_tpu.ops.flash_attention import (_RAISED_CAP, _block_sizes,
                                             _round_up)

    for q_len in (64, 197, 256, 320, 448, 577, 785, 1024, 3136):
        for kv_len in (197, 448, 784, 3136):
            bq, bk = _block_sizes(q_len, kv_len, 12, 64)
            assert bq % 16 == 0 and bk % 128 == 0
            assert bq <= _round_up(q_len, 16)
            s_tiles = 12 * bq * bk * 4
            if s_tiles >= 15 * 1024 * 1024:
                # only the raised regime may exceed the default budget:
                # whole problem in one block, footprint under its cap
                assert bq == max(_round_up(q_len, 16), 64)
                assert bk == _round_up(kv_len, 128)
                assert s_tiles <= _RAISED_CAP

    # measured regression anchors
    assert _block_sizes(197, 197, 12, 64) == (208, 256)   # @224 unchanged
    # CvT stage-1: 2x1568 q blocks (1892 -> 1909 img/s vs round-2's 7x448)
    assert _block_sizes(3136, 784, 1, 64) == (1568, 896)
    # @384 now runs single-block in the raised regime (11.0 -> 6.7
    # ms/layer, benchmarks/vmem384_probe.py)
    assert _block_sizes(577, 577, 12, 64) == (592, 640)


def test_dispatch_threshold_shapes():
    """The auto-dispatch crossover is set END-TO-END, not by isolated-core
    microbenches: the custom_vjp boundary costs ~2 ms/layer of lost fusion,
    so only big-map shapes (CvT stage 1) pay off (docs/PERFORMANCE.md)."""
    q, k, v = make_qkv(197, 197, 12, 64, batch=1)
    assert flash_attention.shape_supported(q, k, v)
    q, k, v = make_qkv(577, 577, 12, 64, batch=1)
    assert flash_attention.shape_supported(q, k, v)   # forced use works
    assert 577 * 577 < 1_000_000                      # ...but auto = XLA
    assert 3136 * 784 >= 1_000_000                    # CvT stage 1 = kernel


def test_extreme_negative_logits_stable():
    """Stable softmax must survive rows whose logits are all strongly
    negative (review finding: a max(m, 0) clamp underflowed l to 0 and
    overflowed the backward's padding-column probabilities to inf)."""
    q, k, v = make_qkv(197, 197, 4, 64, batch=1)
    q = q + 30.0   # scaled logits ~ -60..-100 against orthogonal-ish keys
    k = k - 30.0

    out_ref_ = reference(q, k, v)
    out_kern = kernel(q, k, v)
    assert np.isfinite(np.asarray(out_kern)).all()
    # tolerance is loose: at this dynamic range the two (both correct)
    # softmax formulations differ by f32 rounding, not by stability
    np.testing.assert_allclose(np.asarray(out_kern), np.asarray(out_ref_),
                               atol=2e-2, rtol=2e-2)

    def loss(fn, q):
        return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

    g_kern = jax.grad(lambda q: loss(kernel, q))(q)
    g_ref = jax.grad(lambda q: loss(reference, q))(q)
    assert np.isfinite(np.asarray(g_kern)).all()
    np.testing.assert_allclose(np.asarray(g_kern), np.asarray(g_ref),
                               atol=2e-2, rtol=2e-2)


def test_bwd_blocks_always_divide_the_pads():
    """r5 regression: at ViT-L @384 geometry (h=16, L=577) the fwd's
    raised single block produced a 592-row pad (16*37 — no 64-aligned
    divisor), _bwd_blocks exhausted its candidates and returned the
    fixed (16, 64) fallback, and _bwd's integer-division grid silently
    dropped the tail kv rows: dk/dv for valid row 576 were never
    written (TPU verifier rel-max 0.565; nan in interpret). Blocks must
    always divide the padded lengths, for every geometry."""
    for l in (64, 197, 257, 577, 592, 784, 1024, 3136):
        for heads, d in ((1, 64), (4, 64), (8, 48), (12, 64), (16, 64),
                         (16, 128)):
            bq0, bk0 = flash_attention._block_sizes(l, l, heads, d)
            qp = max(flash_attention._round_up(l, bq0), 64)
            kp = flash_attention._round_up(l, bk0)
            bq, bk = flash_attention._bwd_blocks(qp, kp, bq0, bk0,
                                                 heads, d)
            assert qp % bq == 0 and kp % bk == 0, (l, heads, d, bq, bk)
            # the fused core pads q and kv to ONE shared length
            sp = max(flash_attention._round_up(l, bq0), 64)
            bq, bk = flash_attention._bwd_blocks(sp, sp, sp, sp, heads, d)
            assert sp % bq == 0 and sp % bk == 0, (l, heads, d, bq, bk)


def test_raised_regime_requires_backward_fit():
    """r5 fix: the raised single-block fwd regime must only engage when
    the backward also fits _RAISED_CAP — h=12 @384 stays raised (the
    receipted 1.385x path), h=16 falls to multi-block (the worker-fault
    + silent-drop geometry)."""
    assert flash_attention._block_sizes(577, 577, 12, 64) == (592, 640)
    bq, bk = flash_attention._block_sizes(577, 577, 16, 64)
    assert flash_attention._round_up(577, bq) > bq, (bq, bk)  # multi-q
    from sav_tpu.ops import fused_layer
    assert not fused_layer.fused_supported(577, 16, 64)
    assert fused_layer.fused_supported(577, 12, 64)


def test_auto_core_routes_xla_at_16_heads_multiblock():
    """r5 receipt: multi-block flash at h=16 loses to per-op XLA
    (vit_l @384: 82.4 vs 91.1 img/s) — auto_core must return None
    there, while keeping 'fused' at vit_l @224 (single-block regime,
    +4.3% r4 receipt) and 'flash'/'fused' at h<=12 shapes."""
    import unittest.mock as mock
    from sav_tpu.ops import fused_layer
    with mock.patch.object(flash_attention.jax, 'default_backend',
                           return_value='tpu'), \
         mock.patch.object(fused_layer.jax, 'default_backend',
                           return_value='tpu'):
        assert fused_layer.auto_core(577, 16, 64) is None   # vit_l @384
        assert fused_layer.auto_core(197, 16, 64) == 'fused'  # @224
        assert fused_layer.auto_core(577, 12, 64) == 'fused'  # vit_b @384
        assert fused_layer.auto_core(197, 12, 64) == 'fused'
