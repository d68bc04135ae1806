"""TNT inner-layer Pallas kernel (patches-in-lanes): numerics + wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sav_tpu.ops import tnt_inner

BP, L, D, H = 10, 16, 24, 4
HD = D // H
FF = 4 * D


@pytest.fixture(autouse=True)
def small_blocks(monkeypatch):
    """Shrink the patch block so interpret-mode tests stay fast and the
    zero-padding path (BP=10 -> 128) is exercised."""
    monkeypatch.setattr(tnt_inner, '_NB', 128)


def _args(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 9)
    x = jax.random.normal(ks[0], (BP, L, D), jnp.float32) * 0.5
    mk = lambda i, *s: jax.random.normal(ks[i], s, jnp.float32) / (
        s[0] ** 0.5)
    return (x,
            1.0 + 0.1 * mk(1, D), 0.1 * mk(2, D),            # ln1
            mk(3, D, H, HD), mk(4, D, H, HD), mk(5, D, H, HD),
            mk(6, H, HD, D),
            1.0 + 0.05 * mk(7, D), 0.05 * mk(8, D),          # ln2
            mk(1, D, FF) * 0.5, 0.1 * mk(2, FF),
            mk(3, FF, D) * 0.5, 0.1 * mk(4, D))


def test_forward_matches_twin():
    args = _args()
    got = tnt_inner.inner_layer(*args, H)
    want = tnt_inner.inner_layer_reference(*args, num_heads=H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


def test_grads_match_twin():
    args = _args(seed=1)
    gk = jax.grad(lambda a: jnp.sum(jnp.square(
        tnt_inner.inner_layer(*a, H))))(args)
    gt = jax.grad(lambda a: jnp.sum(jnp.square(
        tnt_inner.inner_layer_reference(*a, num_heads=H))))(args)
    names = ['x', 'ln1s', 'ln1b', 'wq', 'wk', 'wv', 'wo', 'ln2s',
             'ln2b', 'w1', 'b1', 'w2', 'b2']
    for name, a, b in zip(names, gk, gt):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        denom = np.abs(b).max() + 1e-12
        assert np.abs(a - b).max() / denom < 5e-4, (
            name, np.abs(a - b).max(), denom)


def test_auto_block_width(monkeypatch):
    """NB scales inversely with d (d=40 at 896 overflowed scoped VMEM
    by 8 MB on chip); always a lane multiple."""
    monkeypatch.setattr(tnt_inner, '_NB', None)
    assert tnt_inner._nb_for(24) == 896     # TNT-S, measured block
    assert tnt_inner._nb_for(40) == 512     # TNT-B fits 64 MB
    assert tnt_inner._nb_for(64) == 256
    for d in (8, 16, 24, 32, 40, 48, 56, 64):
        assert tnt_inner._nb_for(d) % 128 == 0


def test_supported_geometry():
    assert tnt_inner.supported(16, 24, 4)        # TNT-S inner
    assert tnt_inner.supported(16, 40, 4)        # TNT-B inner
    assert not tnt_inner.supported(16, 25, 5)    # unaligned channels
    assert not tnt_inner.supported(16, 128, 4)   # too wide
    assert not tnt_inner.supported(196, 24, 4)   # too many tokens


@pytest.mark.parametrize('mode', ['fused_inner', 'fused_inner_outer'])
def test_tnt_block_fused_route_matches_standard(mode):
    """EncoderBlock(use_kernel='fused_inner'/'fused_inner_outer') keeps
    the standard param tree and matches the per-op path on shared params
    ('fused_inner_outer' additionally runs the outer attention sublayer
    under one custom_vjp — measured 2.1% slower end to end, kept opt-in;
    docs/PERFORMANCE.md round-3)."""
    from sav_tpu.models.tnt import EncoderBlock

    patches = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 48),
                                jnp.float32)
    pixels = jax.random.normal(jax.random.PRNGKey(1), (2 * 4, L, D),
                               jnp.float32)
    base = EncoderBlock(inner_num_heads=H, outer_num_heads=4,
                        use_kernel=False)
    fused = EncoderBlock(inner_num_heads=H, outer_num_heads=4,
                         use_kernel=mode)
    v = base.init({'params': jax.random.PRNGKey(2)}, patches, pixels,
                  is_training=False)
    v2 = fused.init({'params': jax.random.PRNGKey(2)}, patches, pixels,
                    is_training=False)
    paths = lambda t: {jax.tree_util.keystr(p) for p, _ in
                       jax.tree_util.tree_flatten_with_path(t)[0]}
    assert paths(v) == paths(v2)

    a = base.apply(v, patches, pixels, is_training=False)
    b = fused.apply(v, patches, pixels, is_training=False)
    for xa, xb in zip(a, b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=3e-5, atol=3e-5)

    def loss(m):
        return lambda vv: sum(
            jnp.sum(jnp.square(o))
            for o in m.apply(vv, patches, pixels, is_training=False))
    ga = jax.grad(loss(base))(v)
    gb = jax.grad(loss(fused))(v)
    for pa, pb in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gb)):
        a64 = np.asarray(pa, np.float64)
        b64 = np.asarray(pb, np.float64)
        assert np.abs(a64 - b64).max() / (np.abs(b64).max() + 1e-12) \
            < 5e-4
