"""Fused BoTNet rel-pos attention core: kernel vs jnp twin + model wiring.

Kernel runs in interpret mode here (CPU mesh); real-TPU numerics are
covered by scripts/verify_tpu_numerics.py and the probe receipts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sav_tpu.ops import botnet_attention as ba

B, G, H, HD = 2, 5, 4, 64     # L=25 -> l_pad=64: padding path exercised
L = G * G
DIM = H * HD


def _args(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    mk = lambda k, *s: jax.random.normal(k, s, jnp.float32) * 0.3
    return (mk(ks[0], B, L, DIM), mk(ks[1], B, L, DIM),
            mk(ks[2], B, L, DIM),
            mk(ks[3], 2 * G - 1, HD) / 3, mk(ks[4], 2 * G - 1, HD) / 3)


def test_forward_matches_twin():
    args = _args()
    got = ba.botnet_mhsa(*args, H, G)
    want = ba.bot_mhsa_reference(*args, H, G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_grads_match_twin():
    args = _args(seed=1)
    gk = jax.grad(lambda a: jnp.sum(jnp.square(
        ba.botnet_mhsa(*a, H, G))))(args)
    gt = jax.grad(lambda a: jnp.sum(jnp.square(
        ba.bot_mhsa_reference(*a, H, G))))(args)
    for name, a, b in zip(['qs', 'k', 'v', 'emb_h', 'emb_w'], gk, gt):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        assert np.abs(a - b).max() / (np.abs(b).max() + 1e-12) < 5e-5, name


def test_sublayer_wrapper_matches_twin():
    ks = jax.random.split(jax.random.PRNGKey(2), 6)
    x = jax.random.normal(ks[0], (B, L, DIM), jnp.float32) * 0.3
    wq = jax.random.normal(ks[1], (DIM, H, HD)) / np.sqrt(DIM)
    wk = jax.random.normal(ks[2], (DIM, H, HD)) / np.sqrt(DIM)
    wv = jax.random.normal(ks[3], (DIM, H, HD)) / np.sqrt(DIM)
    emb_h = jax.random.normal(ks[4], (2 * G - 1, HD)) * 0.1
    emb_w = jax.random.normal(ks[5], (2 * G - 1, HD)) * 0.1

    got = ba.botnet_attention_sublayer(x, wq, wk, wv, emb_h, emb_w, H, G)
    flat = lambda w: w.reshape(DIM, DIM)
    qs = (x @ flat(wq)) / np.sqrt(HD)
    want = ba.bot_mhsa_reference(qs, x @ flat(wk), x @ flat(wv),
                                 emb_h, emb_w, H, G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_botmhsa_kernel_route_matches_jnp_route():
    """Forced kernel route == default jnp route on identical params, and
    the param trees are identical (checkpoint compatibility)."""
    from sav_tpu.models.botnet import BoTMHSA
    x = jax.random.normal(jax.random.PRNGKey(3), (2, G, G, DIM),
                          jnp.float32) * 0.5
    jnp_block = BoTMHSA(num_heads=H, use_kernel=False)
    k_block = BoTMHSA(num_heads=H, use_kernel='botnet_fused')
    v = jnp_block.init(jax.random.PRNGKey(4), x)
    v2 = k_block.init(jax.random.PRNGKey(4), x)
    paths = lambda t: {jax.tree_util.keystr(p) for p, _ in
                       jax.tree_util.tree_flatten_with_path(t)[0]}
    assert paths(v) == paths(v2)
    a = np.asarray(jnp_block.apply(v, x))
    b = np.asarray(k_block.apply(v, x))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_auto_route_is_jnp_on_cpu():
    """'auto' must not pick the interpret-mode kernel off-TPU."""
    from sav_tpu.models.botnet import BoTMHSA
    block = BoTMHSA(num_heads=H)
    assert not block._fused_route(G, G, HD)


def test_supported_geometry():
    assert ba.supported(14, 4, 128)       # botnet_t3 @224
    assert ba.supported(24, 4, 128)       # @384
    assert not ba.supported(14, 4, 96)    # off-band head width
    assert not ba.supported(30, 4, 128)   # grid too large
    assert not ba.supported(2, 4, 128)    # degenerate grid
