"""Fused Mixer token-mixing sublayer (ops.mixer_token) vs the per-op path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sav_tpu.ops import mixer_token

B, L, D, K = 5, 24, 128, 12


def _args(dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    x = jax.random.normal(ks[0], (B, L, D), dtype)
    ls = 1 + 0.1 * jax.random.normal(ks[1], (D,))
    lb = 0.1 * jax.random.normal(ks[2], (D,))
    w1 = jax.random.normal(ks[3], (L, K)) * 0.05
    b1 = 0.1 * jax.random.normal(ks[4], (K,))
    w2 = jax.random.normal(ks[5], (K, L)) * 0.05
    b2 = 0.1 * jax.random.normal(ks[6], (L,))
    return (x, ls, lb, w1, b1, w2, b2)


def test_forward_matches_reference(monkeypatch):
    # NI=2 with B=5 exercises the zero-image padding path
    monkeypatch.setattr(mixer_token, '_NI', 2)
    args = _args()
    out_k = mixer_token.token_mix_sublayer(*args)
    out_r = mixer_token.token_mix_reference(*args)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_reference(monkeypatch):
    monkeypatch.setattr(mixer_token, '_NI', 2)
    args = _args()

    def loss(fn):
        return lambda *a: jnp.sum(jnp.square(fn(*a)))

    gk = jax.grad(loss(mixer_token.token_mix_sublayer),
                  argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss(mixer_token.token_mix_reference),
                  argnums=tuple(range(7)))(*args)
    for a, b in zip(gk, gr):
        a64 = np.asarray(a, np.float64)
        b64 = np.asarray(b, np.float64)
        assert np.abs(a64 - b64).max() / (np.abs(b64).max() + 1e-12) < 5e-5


def test_supported_geometry():
    assert mixer_token.supported(196, 98, 768)    # mixer_b @224
    assert mixer_token.supported(49, 24, 512)     # mixer_s_patch32
    assert not mixer_token.supported(196, 98, 384 + 8)  # unaligned d
    assert not mixer_token.supported(577, 288, 768)     # too many tokens
    assert not mixer_token.supported(196, 4, 768)       # degenerate hidden


def test_mixer_block_fused_route_matches_standard(monkeypatch):
    """MixerBlock(use_kernel='fused_token') keeps the standard param tree
    and matches the per-op path on shared params."""
    from sav_tpu.models.mlp_mixer import MixerBlock

    monkeypatch.setattr(mixer_token, '_NI', 2)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, D), jnp.float32)
    base = MixerBlock(tokens_expand_ratio=0.5, channels_expand_ratio=4,
                      use_kernel=False)
    fused = MixerBlock(tokens_expand_ratio=0.5, channels_expand_ratio=4,
                       use_kernel='fused_token')
    v = base.init(jax.random.PRNGKey(2), x, is_training=False)
    v2 = fused.init(jax.random.PRNGKey(2), x, is_training=False)
    paths = lambda t: {jax.tree_util.keystr(p) for p, _ in
                       jax.tree_util.tree_flatten_with_path(t)[0]}
    assert paths(v) == paths(v2)

    a = base.apply(v, x, is_training=False)
    b = fused.apply(v, x, is_training=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=3e-5, atol=3e-5)

    def loss(m):
        return lambda vv: jnp.sum(
            jnp.square(m.apply(vv, x, is_training=False)))
    ga = jax.grad(loss(base))(v)
    gb = jax.grad(loss(fused))(v)
    for pa, pb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        a64 = np.asarray(pa, np.float64)
        b64 = np.asarray(pb, np.float64)
        assert np.abs(a64 - b64).max() / (np.abs(b64).max() + 1e-12) \
            < 5e-4


def test_full_mixer_kernel_route(monkeypatch):
    """Whole-model parity: forced kernel route vs use_kernel=False."""
    from sav_tpu.models import create_model

    monkeypatch.setattr(mixer_token, '_NI', 2)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 64, 64, 3))
    base = create_model('mixer_s_patch16', num_classes=11,
                        use_kernel=False)
    fused = create_model('mixer_s_patch16', num_classes=11,
                         use_kernel='fused_token')
    v = jax.jit(base.init, static_argnames='is_training')(
        jax.random.PRNGKey(2), jnp.ones((1, 64, 64, 3)),
        is_training=False)
    a = base.apply(v, x, is_training=False)
    b = fused.apply(v, x, is_training=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)
