"""Layer-granularity fused attention sublayer: numerics and gradients.

``ops.fused_layer.attention_sublayer`` puts the whole pre-LN attention
sublayer (reference span: models/vit.py:21-27 + attention.py:29-63) behind
one custom_vjp. These tests pin every core ('xla', 'flash' in interpret
mode, 'fused' single-kernel) against a plain-autodiff jnp composition, and
prove the ViT wiring (use_kernel='fused_layer*') is parameter-tree- and
output-identical to the standard path.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sav_tpu.ops import fused_layer

B, L, D, H = 2, 19, 64, 4   # deliberately unaligned L (pads to 32)
DH = D // H


def _params(seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.1, jnp.float32)
    return dict(x=mk(B, L, D), scale=1.0 + 0.1 * mk(D), bias=0.1 * mk(D),
                wq=mk(D, H, DH), wk=mk(D, H, DH), wv=mk(D, H, DH),
                wo=mk(H, DH, D))


def _reference(x, scale, bias, wq, wk, wv, wo):
    """Plain-autodiff composition of the same math."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, -1, keepdims=True) - mu * mu, 0.0)
    y = (xf - mu) * jax.lax.rsqrt(var + fused_layer.LN_EPS)
    y = y * scale + bias
    q = jnp.einsum('bld,dhc->blhc', y, wq) / jnp.sqrt(DH)
    k = jnp.einsum('bld,dhc->blhc', y, wk)
    v = jnp.einsum('bld,dhc->blhc', y, wv)
    p = jax.nn.softmax(jnp.einsum('bqhc,bkhc->bhqk', q, k))
    attn = jnp.einsum('bhqk,bkhc->bqhc', p, v)
    return x + jnp.einsum('bqhc,hcd->bqd', attn, wo)


def _fused(core):
    def f(x, scale, bias, wq, wk, wv, wo):
        return fused_layer.attention_sublayer(x, scale, bias, wq, wk, wv,
                                              wo, H, core,
                                              fused_layer.LN_EPS)
    return f


@pytest.mark.parametrize('core', fused_layer.CORES)
def test_forward_matches_reference(core):
    p = _params()
    out = _fused(core)(**p)
    expected = _reference(**p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize('core', fused_layer.CORES)
def test_gradients_match_reference(core):
    p = _params()
    args = [p[k] for k in ('x', 'scale', 'bias', 'wq', 'wk', 'wv', 'wo')]
    cot = jnp.asarray(np.random.RandomState(1).randn(B, L, D), jnp.float32)

    def loss(f):
        return lambda *a: jnp.sum(f(*a) * cot)

    grads = jax.grad(loss(_fused(core)), argnums=tuple(range(7)))(*args)
    expected = jax.grad(loss(_reference), argnums=tuple(range(7)))(*args)
    for g, e, name in zip(grads, expected,
                          ('x', 'scale', 'bias', 'wq', 'wk', 'wv', 'wo')):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(e), atol=5e-5, rtol=5e-4,
            err_msg=f'{core}: grad mismatch for {name}')


def test_fused_supported_predicate():
    assert fused_layer.fused_supported(197, 12, 64)
    assert not fused_layer.fused_supported(197, 12, 48)   # band-unaligned
    # round 3: the raised-VMEM single-block regime makes @384 eligible
    assert fused_layer.fused_supported(577, 12, 64)


@pytest.mark.parametrize('mode', ['fused_layer', 'fused_layer_xla',
                                  'fused_layer_full'])
def test_vit_fused_layer_matches_default(mode):
    """The ViT wiring: identical param tree AND identical outputs (same
    params applied through both paths) — checkpoint interchangeability."""
    from sav_tpu.models import ViT

    default = ViT(num_classes=8, num_layers=2, num_heads=4, embed_dim=64,
                  patch_shape=(16, 16), dtype=jnp.float32,
                  use_kernel=False)
    fused = ViT(num_classes=8, num_layers=2, num_heads=4, embed_dim=64,
                patch_shape=(16, 16), dtype=jnp.float32, use_kernel=mode)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                    jnp.float32)
    variables = default.init(jax.random.PRNGKey(0), x, is_training=False)
    fused_variables = fused.init(jax.random.PRNGKey(0), x,
                                 is_training=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(fused_variables))
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables),
            jax.tree_util.tree_leaves_with_path(fused_variables)):
        assert a.shape == b.shape, jax.tree_util.keystr(pa)

    out_default = default.apply(variables, x, is_training=False)
    out_fused = fused.apply(variables, x, is_training=False)
    np.testing.assert_allclose(np.asarray(out_fused),
                               np.asarray(out_default),
                               atol=5e-5, rtol=5e-5)


def test_vit_fused_layer_trains():
    """Grads flow through the fused path inside a real train step."""
    from sav_tpu.data.synthetic import SyntheticDataset
    from sav_tpu.models import ViT
    from sav_tpu.parallel.mesh import create_mesh
    from sav_tpu.train import steps as steps_lib
    from sav_tpu.train.state import TrainState, build_optimizer

    mesh = create_mesh()
    model = ViT(num_classes=8, num_layers=2, num_heads=4, embed_dim=64,
                patch_shape=(16, 16), dtype=jnp.float32,
                use_kernel='fused_layer')
    tx = build_optimizer(1e-3, weight_decay=1e-4, clip_grad=1.0)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.ones((1, 32, 32, 3)), is_training=False)
    state = steps_lib.shard_state(mesh, TrainState.create(variables, tx))
    data = SyntheticDataset(16, 32, num_classes=8, mesh=mesh)
    step_fn = steps_lib.make_train_step(model, tx, mesh, state,
                                        num_classes=8)
    batch = data.batch(0)
    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
        losses.append(float(metrics['loss']))
    assert losses[-1] < losses[0]


@pytest.mark.parametrize('mode', ['fused_layer', 'fused_layer_xla'])
def test_tnt_fused_outer_matches_default(mode):
    """TNT's outer attention through the fused sublayer (residual=False,
    the skip adds pre-bridge patch embeddings): identical tree + outputs."""
    from sav_tpu.models import TNT

    kwargs = dict(num_classes=8, num_layers=2, inner_num_heads=2,
                  outer_num_heads=4, inner_embed_dim=16, outer_embed_dim=64,
                  patch_shape=(16, 16), transformed_patch_shape=(4, 4),
                  dtype=jnp.float32)
    default = TNT(use_kernel=False, **kwargs)
    fused = TNT(use_kernel=mode, **kwargs)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                    jnp.float32)
    variables = default.init(jax.random.PRNGKey(0), x, is_training=False)
    fused_variables = fused.init(jax.random.PRNGKey(0), x,
                                 is_training=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(fused_variables))
    np.testing.assert_allclose(
        np.asarray(fused.apply(variables, x, is_training=False)),
        np.asarray(default.apply(variables, x, is_training=False)),
        atol=5e-5, rtol=5e-5)


HID = 4 * D


def _ff_params(seed=2):
    rng = np.random.RandomState(seed)
    mk = lambda *s: jnp.asarray(rng.randn(*s) * 0.1, jnp.float32)
    return dict(scale2=1.0 + 0.1 * mk(D), bias2=0.1 * mk(D),
                w1=mk(D, HID), b1=0.1 * mk(HID), w2=mk(HID, D),
                b2=0.1 * mk(D))


def _block_reference(x, scale, bias, wq, wk, wv, wo, scale2, bias2, w1, b1,
                     w2, b2):
    a = _reference(x, scale, bias, wq, wk, wv, wo)
    af = a.astype(jnp.float32)
    mu = jnp.mean(af, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(af * af, -1, keepdims=True) - mu * mu, 0.0)
    y2 = (af - mu) * jax.lax.rsqrt(var + fused_layer.LN_EPS)
    y2 = y2 * scale2 + bias2
    return a + jax.nn.gelu(y2 @ w1 + b1) @ w2 + b2


@pytest.mark.parametrize('core', fused_layer.CORES)
def test_encoder_layer_matches_reference(core):
    p = {**_params(), **_ff_params()}

    def fused(**kw):
        return fused_layer.encoder_layer(
            kw['x'], kw['scale'], kw['bias'], kw['wq'], kw['wk'], kw['wv'],
            kw['wo'], kw['scale2'], kw['bias2'], kw['w1'], kw['b1'],
            kw['w2'], kw['b2'], H, core, fused_layer.LN_EPS)

    np.testing.assert_allclose(np.asarray(fused(**p)),
                               np.asarray(_block_reference(**p)),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize('core', ['xla', 'flash'])
def test_encoder_layer_gradients_match_reference(core):
    p = {**_params(), **_ff_params()}
    names = ('x', 'scale', 'bias', 'wq', 'wk', 'wv', 'wo', 'scale2',
             'bias2', 'w1', 'b1', 'w2', 'b2')
    args = [p[k] for k in names]
    cot = jnp.asarray(np.random.RandomState(3).randn(B, L, D), jnp.float32)

    def fused(*a):
        return fused_layer.encoder_layer(*a, H, core, fused_layer.LN_EPS)

    def ref(*a):
        return _block_reference(*a)

    grads = jax.grad(lambda *a: jnp.sum(fused(*a) * cot),
                     argnums=tuple(range(13)))(*args)
    expected = jax.grad(lambda *a: jnp.sum(ref(*a) * cot),
                        argnums=tuple(range(13)))(*args)
    for g, e, name in zip(grads, expected, names):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(e), atol=1e-4, rtol=1e-3,
            err_msg=f'{core}: encoder-layer grad mismatch for {name}')


@pytest.mark.parametrize('mode', ['fused_block', 'fused_block_full'])
def test_vit_fused_block_matches_default(mode):
    """Whole-encoder-layer boundary: identical tree + outputs vs default."""
    from sav_tpu.models import ViT

    default = ViT(num_classes=8, num_layers=2, num_heads=4, embed_dim=64,
                  patch_shape=(16, 16), dtype=jnp.float32,
                  use_kernel=False)
    fused = ViT(num_classes=8, num_layers=2, num_heads=4, embed_dim=64,
                patch_shape=(16, 16), dtype=jnp.float32, use_kernel=mode)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                    jnp.float32)
    variables = default.init(jax.random.PRNGKey(0), x, is_training=False)
    fused_variables = fused.init(jax.random.PRNGKey(0), x,
                                 is_training=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(fused_variables))
    np.testing.assert_allclose(
        np.asarray(fused.apply(variables, x, is_training=False)),
        np.asarray(default.apply(variables, x, is_training=False)),
        atol=5e-5, rtol=5e-5)


def _reference_noln(x, wq, wk, wv, wo):
    """Post-LN span: x + W_o @ MHA(x) — attention consumes the raw input."""
    y = x.astype(jnp.float32)
    q = jnp.einsum('bld,dhc->blhc', y, wq) / jnp.sqrt(DH)
    k = jnp.einsum('bld,dhc->blhc', y, wk)
    v = jnp.einsum('bld,dhc->blhc', y, wv)
    p = jax.nn.softmax(jnp.einsum('bqhc,bkhc->bhqk', q, k))
    attn = jnp.einsum('bhqk,bkhc->bqhc', p, v)
    return x + jnp.einsum('bqhc,hcd->bqd', attn, wo)


@pytest.mark.parametrize('core', fused_layer.CORES)
def test_noln_forward_and_grads_match_reference(core):
    """attention_sublayer_noln (CeiT's post-LN span) vs plain autodiff."""
    p = _params()
    names = ('x', 'wq', 'wk', 'wv', 'wo')
    args = [p[k] for k in names]
    cot = jnp.asarray(np.random.RandomState(4).randn(B, L, D), jnp.float32)

    def fused(*a):
        return fused_layer.attention_sublayer_noln(*a, H, core)

    np.testing.assert_allclose(np.asarray(fused(*args)),
                               np.asarray(_reference_noln(*args)),
                               atol=2e-5, rtol=2e-5)
    grads = jax.grad(lambda *a: jnp.sum(fused(*a) * cot),
                     argnums=tuple(range(5)))(*args)
    expected = jax.grad(lambda *a: jnp.sum(_reference_noln(*a) * cot),
                        argnums=tuple(range(5)))(*args)
    for g, e, name in zip(grads, expected, names):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(e), atol=5e-5, rtol=5e-4,
            err_msg=f'{core}: noln grad mismatch for {name}')


@pytest.mark.parametrize('mode', ['fused_layer', 'fused_layer_xla',
                                  'fused_layer_full'])
def test_ceit_fused_layer_matches_default(mode):
    """CeiT wiring (post-LN encoder through attention_sublayer_noln):
    identical param tree + outputs vs the standard path."""
    from sav_tpu.models import CeiT

    kwargs = dict(num_classes=8, num_layers=2, num_heads=4, embed_dim=64,
                  patch_shape=(4, 4), dtype=jnp.float32)
    default = CeiT(use_kernel=False, **kwargs)
    fused = CeiT(use_kernel=mode, **kwargs)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                    jnp.float32)
    variables = default.init(jax.random.PRNGKey(0), x, is_training=False)
    fused_variables = fused.init(jax.random.PRNGKey(0), x,
                                 is_training=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(fused_variables))
    np.testing.assert_allclose(
        np.asarray(fused.apply(variables, x, is_training=False)),
        np.asarray(default.apply(variables, x, is_training=False)),
        atol=5e-5, rtol=5e-5)


@pytest.mark.parametrize('core', ['xla', 'flash', 'fused'])
def test_rotary_fused_sublayer_matches_rotary_default(core):
    """pos_embed='rotary' composed with the fused sublayer: values and
    loss gradients match the per-op rotary path ('fused' silently
    downgrades to 'flash' — rotation is not in the single kernel)."""
    from sav_tpu.models import ViT

    mode = {'xla': 'fused_layer_xla', 'flash': 'fused_layer',
            'fused': 'fused_layer_full'}[core]
    mk = lambda uk: ViT(num_classes=8, num_layers=2, num_heads=4,
                        embed_dim=64, patch_shape=(16, 16),
                        dtype=jnp.float32, pos_embed='rotary',
                        use_kernel=uk)
    default, fused = mk(False), mk(mode)
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                    jnp.float32)
    variables = default.init(jax.random.PRNGKey(0), x, is_training=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(
                fused.init(jax.random.PRNGKey(0), x, is_training=False)))
    np.testing.assert_allclose(
        np.asarray(fused.apply(variables, x, is_training=False)),
        np.asarray(default.apply(variables, x, is_training=False)),
        atol=5e-5, rtol=5e-5)

    labels = jax.nn.one_hot(jnp.array([1, 3]), 8)

    def loss(model):
        def f(params):
            import optax
            logits = model.apply({'params': params}, x, is_training=False)
            return jnp.mean(optax.softmax_cross_entropy(logits, labels))
        return f

    g_def = jax.grad(loss(default))(variables['params'])
    g_fused = jax.grad(loss(fused))(variables['params'])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4),
        g_fused, g_def)


# --------------------------------------- FF sublayer with Pallas backward

def _ff_sublayer_reference(x, scale2, bias2, w1, b1, w2, b2):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, -1, keepdims=True) - mu * mu, 0.0)
    y2 = (xf - mu) * jax.lax.rsqrt(var + fused_layer.LN_EPS)
    y2 = y2 * scale2 + bias2
    return x + jax.nn.gelu(y2 @ w1 + b1) @ w2 + b2


def test_ff_sublayer_forward_matches_reference():
    p = _ff_params()
    x = jnp.asarray(np.random.RandomState(7).randn(B, L, D) * 0.1,
                    jnp.float32)
    got = fused_layer.ff_sublayer(x, **p)
    want = _ff_sublayer_reference(x, **p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_ff_sublayer_grads_match_reference():
    """Pallas backward (dh in VMEM, dW f32 accumulators, closed-form
    tanh-gelu derivative) vs plain autodiff — all seven gradients."""
    p = _ff_params(seed=5)
    x = jnp.asarray(np.random.RandomState(8).randn(B, L, D) * 0.1,
                    jnp.float32)
    args = (x, p['scale2'], p['bias2'], p['w1'], p['b1'], p['w2'], p['b2'])

    gk = jax.grad(lambda a: jnp.sum(jnp.square(
        fused_layer.ff_sublayer(*a))))(args)
    gt = jax.grad(lambda a: jnp.sum(jnp.square(
        _ff_sublayer_reference(*a))))(args)
    names = ['x', 'scale2', 'bias2', 'w1', 'b1', 'w2', 'b2']
    for name, a, b in zip(names, gk, gt):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        assert np.abs(a - b).max() / (np.abs(b).max() + 1e-12) < 5e-4, name


def test_ff_sublayer_row_padding_exact():
    """M not divisible by the block rows: padded rows contribute nothing."""
    p = _ff_params(seed=6)
    x = jnp.asarray(np.random.RandomState(9).randn(1, 3, D) * 0.1,
                    jnp.float32)
    got = fused_layer.ff_sublayer(x, **p)
    want = _ff_sublayer_reference(x, **p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_ff_kernel_supported_geometry():
    assert fused_layer.ff_kernel_supported(768, 3072)    # ViT-B
    assert fused_layer.ff_kernel_supported(1024, 4096)   # ViT-L
    assert not fused_layer.ff_kernel_supported(4096, 16384)


def test_vit_fused_ff_matches_default():
    """use_kernel='fused_ff' keeps the standard param tree and matches
    the per-op path on shared params (outputs + grads)."""
    from sav_tpu.models import ViT

    default = ViT(num_classes=8, num_layers=2, num_heads=4, embed_dim=64,
                  patch_shape=(16, 16), dtype=jnp.float32,
                  use_kernel=False)
    fused = ViT(num_classes=8, num_layers=2, num_heads=4, embed_dim=64,
                patch_shape=(16, 16), dtype=jnp.float32,
                use_kernel='fused_ff')
    x = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 3),
                    jnp.float32)
    variables = default.init(jax.random.PRNGKey(0), x, is_training=False)
    fused_variables = fused.init(jax.random.PRNGKey(0), x,
                                 is_training=False)
    assert (jax.tree_util.tree_structure(variables)
            == jax.tree_util.tree_structure(fused_variables))

    out_default = default.apply(variables, x, is_training=False)
    out_fused = fused.apply(variables, x, is_training=False)
    np.testing.assert_allclose(np.asarray(out_fused),
                               np.asarray(out_default),
                               atol=5e-5, rtol=5e-5)

    def loss(m):
        return lambda params: jnp.sum(jnp.square(m.apply(
            {'params': params}, x, is_training=False)))
    g_def = jax.grad(loss(default))(variables['params'])
    g_fused = jax.grad(loss(fused))(variables['params'])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4),
        g_fused, g_def)
