"""Talking-heads fused sublayer: kernel vs jnp twin (fwd + all grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sav_tpu.ops import th_attention as th

B, L, D, H, HD = 2, 37, 64, 4, 12   # head_ch deliberately off-band (12<64)


def _args(seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    x = jax.random.normal(ks[0], (B, L, D), dtype)
    scale = 1.0 + 0.1 * jax.random.normal(ks[1], (D,))
    bias = 0.1 * jax.random.normal(ks[2], (D,))
    wq = jax.random.normal(ks[3], (D, H, HD), jnp.float32) / np.sqrt(D)
    wk = jax.random.normal(ks[4], (D, H, HD), jnp.float32) / np.sqrt(D)
    wv = jax.random.normal(ks[5], (D, H, HD), jnp.float32) / np.sqrt(D)
    wo = jax.random.normal(ks[6], (H, HD, D), jnp.float32) / np.sqrt(D)
    mk = jax.random.split(ks[7])
    m_pre = jnp.eye(H) + 0.2 * jax.random.normal(mk[0], (H, H))
    m_post = jnp.eye(H) + 0.2 * jax.random.normal(mk[1], (H, H))
    return (x, scale, bias, wq, wk, wv, wo, m_pre, m_post)


@pytest.mark.parametrize('residual', [False, True])
def test_forward_matches_twin(residual):
    args = _args()
    got = th.th_attention_sublayer(*args, H, th.LN_EPS, residual)
    want = th.th_sublayer_reference(*args, residual=residual)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_twin():
    args = _args(seed=1)

    def loss_kernel(args):
        out = th.th_attention_sublayer(*args, H, th.LN_EPS, False)
        return jnp.sum(jnp.square(out))

    def loss_twin(args):
        return jnp.sum(jnp.square(th.th_sublayer_reference(*args)))

    gk = jax.grad(loss_kernel)(args)
    gt = jax.grad(loss_twin)(args)
    names = ['x', 'scale', 'bias', 'wq', 'wk', 'wv', 'wo', 'm_pre',
             'm_post']
    for name, a, b in zip(names, gk, gt):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        denom = np.abs(b).max() + 1e-12
        assert np.abs(a - b).max() / denom < 5e-4, (
            name, np.abs(a - b).max(), denom)


def test_identity_mixes_reduce_to_plain_attention():
    """With identity transforms the span equals plain (no-TH) attention."""
    from sav_tpu.ops.fused_layer import _layernorm
    x, scale, bias, wq, wk, wv, wo, _, _ = _args(seed=2)
    eye = jnp.eye(H)
    got = th.th_attention_sublayer(x, scale, bias, wq, wk, wv, wo, eye,
                                   eye, H, th.LN_EPS, False)
    y, _, _ = _layernorm(x, scale, bias, th.LN_EPS)
    q = jnp.einsum('bld,dhc->blhc', y, wq) / np.sqrt(HD)
    k = jnp.einsum('bld,dhc->blhc', y, wk)
    v = jnp.einsum('bld,dhc->blhc', y, wv)
    a = jax.nn.softmax(jnp.einsum('bqhc,bphc->bhqp', q, k), axis=-1)
    want = jnp.einsum('bqhc,hcd->bqd',
                      jnp.einsum('bhqp,bphc->bqhc', a, v), wo)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_cait_block_fused_route_matches_standard():
    """CaiT EncoderBlock(use_kernel='fused_th') keeps the standard param
    tree and matches the per-op path on shared params."""
    from sav_tpu.models.cait import EncoderBlock
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, D), jnp.float32)
    base = EncoderBlock(num_heads=H, stoch_depth_rate=0.0,
                        layerscale_eps=1e-4, use_kernel=False)
    fused = EncoderBlock(num_heads=H, stoch_depth_rate=0.0,
                         layerscale_eps=1e-4, use_kernel='fused_th')
    v = base.init({'params': jax.random.PRNGKey(1)}, x, is_training=False)
    v2 = fused.init({'params': jax.random.PRNGKey(1)}, x,
                    is_training=False)
    paths = lambda t: {jax.tree_util.keystr(p) for p, _ in
                       jax.tree_util.tree_flatten_with_path(t)[0]}
    assert paths(v) == paths(v2)

    a = np.asarray(base.apply(v, x, is_training=False))
    b = np.asarray(fused.apply(v, x, is_training=False))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)

    ga = jax.grad(lambda v: jnp.sum(jnp.square(
        base.apply(v, x, is_training=False))))(v)
    gb = jax.grad(lambda v: jnp.sum(jnp.square(
        fused.apply(v, x, is_training=False))))(v)
    for pa, pb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        a64 = np.asarray(pa, np.float64)
        b64 = np.asarray(pb, np.float64)
        assert np.abs(a64 - b64).max() / (np.abs(b64).max() + 1e-12) \
            < 5e-4


def test_th_supported_geometry():
    assert th.th_supported(196, 8, 48)       # CaiT-S24
    assert not th.th_supported(196, 8, 128)  # head_ch over the band
    assert not th.th_supported(4096, 16, 48)  # logits lists over budget


def test_th_mode_dispatch():
    assert th.th_mode(196, 8, 48) == 'fused'      # CaiT @224
    assert th.th_mode(577, 8, 48) == 'blocked'    # CaiT @384
    assert th.th_mode(577, 8, 128) is None        # over the lane band
    assert th.th_mode(9000, 8, 48) is None        # over the blocked budget


class TestBlockedCore:
    """L past the unrolled budget routes through the q-blocked core."""
    B2, L2, D2, H2, HD2 = 2, 400, 64, 8, 8

    def _args(self, seed=3):
        c = self
        ks = jax.random.split(jax.random.PRNGKey(seed), 8)
        x = jax.random.normal(ks[0], (c.B2, c.L2, c.D2), jnp.float32)
        scale = 1.0 + 0.1 * jax.random.normal(ks[1], (c.D2,))
        bias = 0.1 * jax.random.normal(ks[2], (c.D2,))
        wq = jax.random.normal(ks[3], (c.D2, c.H2, c.HD2)) / np.sqrt(c.D2)
        wk = jax.random.normal(ks[4], (c.D2, c.H2, c.HD2)) / np.sqrt(c.D2)
        wv = jax.random.normal(ks[5], (c.D2, c.H2, c.HD2)) / np.sqrt(c.D2)
        wo = jax.random.normal(ks[6], (c.H2, c.HD2, c.D2)) / np.sqrt(c.D2)
        mk = jax.random.split(ks[7])
        m_pre = jnp.eye(c.H2) + 0.2 * jax.random.normal(mk[0],
                                                        (c.H2, c.H2))
        m_post = jnp.eye(c.H2) + 0.2 * jax.random.normal(mk[1],
                                                         (c.H2, c.H2))
        return (x, scale, bias, wq, wk, wv, wo, m_pre, m_post)

    def test_routes_blocked(self):
        assert th.th_mode(self.L2, self.H2, self.HD2) == 'blocked'

    def test_forward_matches_twin(self):
        args = self._args()
        got = th.th_attention_sublayer(*args, self.H2, th.LN_EPS, False)
        want = th.th_sublayer_reference(*args)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_grads_match_twin(self):
        args = self._args(seed=4)
        gk = jax.grad(lambda a: jnp.sum(jnp.square(
            th.th_attention_sublayer(*a, self.H2, th.LN_EPS, False))))(args)
        gt = jax.grad(lambda a: jnp.sum(jnp.square(
            th.th_sublayer_reference(*a))))(args)
        names = ['x', 'scale', 'bias', 'wq', 'wk', 'wv', 'wo', 'm_pre',
                 'm_post']
        for name, a, b in zip(names, gk, gt):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            denom = np.abs(b).max() + 1e-12
            assert np.abs(a - b).max() / denom < 5e-4, (
                name, np.abs(a - b).max(), denom)


def test_th_mode_routing_regimes():
    """r5 regression pins, all measured (benchmarks/cait_m_probe.py +
    sweep_r05): the q-blocked core routes only at its receipted l >= 320
    regime (at l=196/h=16 it measured 126.0 img/s vs 156.5 per-op XLA).
    cait_m @224 routes 'fused' under the 3.5 MB cap WITH the raised
    per-kernel vmem limit (_fused_cparams) — without the raise the pair
    500'd inside the train-step scan. cait_s keeps its round-3 routes
    (and its geometry stays under 3 MB: default compiler params)."""
    from sav_tpu.ops import th_attention as th
    assert th.th_mode(196, 8, 48) == 'fused'      # cait_s @224
    assert th.th_mode(576, 8, 48) == 'blocked'    # cait_s @384
    assert th.th_mode(196, 16, 48) == 'fused'     # cait_m @224
    assert th.th_mode(576, 16, 48) is None        # over both list caps
    import unittest.mock as mock
    from sav_tpu.ops import flash_attention as fa
    with mock.patch.object(fa, '_interpret', return_value=False):
        assert th._fused_cparams(8, 208, 196) == {}   # cait_s: defaults
        assert th._fused_cparams(16, 208, 196) != {}  # cait_m: raised
