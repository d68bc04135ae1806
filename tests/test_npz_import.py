"""vision_transformer (AugReg) npz import.

Ground truth here is a from-scratch numpy forward implementing the
ORIGINAL google-research/vision_transformer semantics directly from its
checkpoint tensors (conv patch embed + bias, flax-default LayerNorm
eps=1e-6, q/sqrt(head) scaling, tanh gelu, pre-LN blocks) — a third
independent implementation pinning our ViT math, alongside the reference
golden tests and the HF/torch cross-check.
"""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sav_tpu.models.factory import create_model
from sav_tpu.models.vit import ViT
from sav_tpu.utils.hf_import import model_spec
from sav_tpu.utils.npz_import import convert_vit_npz
from sav_tpu.utils.stacking import stack_layer_params

DIM, LAYERS, HEADS, PATCH, IMG, CLASSES = 64, 3, 4, 8, 32, 13
HIDDEN = 4 * DIM
GRID = IMG // PATCH


def _make_npz(rng, pre_logits=False):
    """Random checkpoint in the vision_transformer flat-npz layout."""
    n = lambda *s: rng.normal(scale=0.05, size=s).astype(np.float32)
    sd = {
        'embedding/kernel': n(PATCH, PATCH, 3, DIM),
        'embedding/bias': n(DIM),
        'cls': n(1, 1, DIM),
        'Transformer/posembed_input/pos_embedding':
            n(1, GRID * GRID + 1, DIM),
        'Transformer/encoder_norm/scale': 1.0 + n(DIM),
        'Transformer/encoder_norm/bias': n(DIM),
        'head/kernel': n(DIM, CLASSES),
        'head/bias': n(CLASSES),
    }
    head = DIM // HEADS
    for i in range(LAYERS):
        p = f'Transformer/encoderblock_{i}/'
        a = p + 'MultiHeadDotProductAttention_1/'
        sd.update({
            p + 'LayerNorm_0/scale': 1.0 + n(DIM),
            p + 'LayerNorm_0/bias': n(DIM),
            p + 'LayerNorm_2/scale': 1.0 + n(DIM),
            p + 'LayerNorm_2/bias': n(DIM),
            a + 'query/kernel': n(DIM, HEADS, head),
            a + 'query/bias': n(HEADS, head),
            a + 'key/kernel': n(DIM, HEADS, head),
            a + 'key/bias': n(HEADS, head),
            a + 'value/kernel': n(DIM, HEADS, head),
            a + 'value/bias': n(HEADS, head),
            a + 'out/kernel': n(HEADS, head, DIM),
            a + 'out/bias': n(DIM),
            p + 'MlpBlock_3/Dense_0/kernel': n(DIM, HIDDEN),
            p + 'MlpBlock_3/Dense_0/bias': n(HIDDEN),
            p + 'MlpBlock_3/Dense_1/kernel': n(HIDDEN, DIM),
            p + 'MlpBlock_3/Dense_1/bias': n(DIM),
        })
    if pre_logits:
        sd['pre_logits/kernel'] = n(DIM, DIM)
        sd['pre_logits/bias'] = n(DIM)
    return sd


def _ln(x, scale, bias, eps=1e-6):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * scale + bias


def _gelu_tanh(x):
    return 0.5 * x * (1.0 + np.tanh(
        np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def _softmax(x):
    x = x - x.max(-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(-1, keepdims=True)


def _numpy_vit(sd, images):
    """The original model, straight off the npz tensors."""
    b = images.shape[0]
    kern, bias = sd['embedding/kernel'], sd['embedding/bias']
    tokens = np.zeros((b, GRID * GRID, DIM), np.float32)
    for gi in range(GRID):
        for gj in range(GRID):
            patch = images[:, gi * PATCH:(gi + 1) * PATCH,
                           gj * PATCH:(gj + 1) * PATCH, :]
            tokens[:, gi * GRID + gj] = (
                np.tensordot(patch, kern, axes=([1, 2, 3], [0, 1, 2]))
                + bias)
    x = np.concatenate([np.tile(sd['cls'], (b, 1, 1)), tokens], axis=1)
    x = x + sd['Transformer/posembed_input/pos_embedding']
    head = DIM // HEADS
    for i in range(LAYERS):
        p = f'Transformer/encoderblock_{i}/'
        a = p + 'MultiHeadDotProductAttention_1/'
        y = _ln(x, sd[p + 'LayerNorm_0/scale'], sd[p + 'LayerNorm_0/bias'])
        q = np.einsum('bld,dhk->blhk', y, sd[a + 'query/kernel']
                      ) + sd[a + 'query/bias']
        k = np.einsum('bld,dhk->blhk', y, sd[a + 'key/kernel']
                      ) + sd[a + 'key/bias']
        v = np.einsum('bld,dhk->blhk', y, sd[a + 'value/kernel']
                      ) + sd[a + 'value/bias']
        logits = np.einsum('bqhk,bshk->bhqs', q / np.sqrt(head), k)
        attn = np.einsum('bhqs,bshk->bqhk', _softmax(logits), v)
        x = x + (np.einsum('bqhk,hkd->bqd', attn, sd[a + 'out/kernel'])
                 + sd[a + 'out/bias'])
        y = _ln(x, sd[p + 'LayerNorm_2/scale'], sd[p + 'LayerNorm_2/bias'])
        h = _gelu_tanh(y @ sd[p + 'MlpBlock_3/Dense_0/kernel']
                       + sd[p + 'MlpBlock_3/Dense_0/bias'])
        x = x + (h @ sd[p + 'MlpBlock_3/Dense_1/kernel']
                 + sd[p + 'MlpBlock_3/Dense_1/bias'])
    x = _ln(x, sd['Transformer/encoder_norm/scale'],
            sd['Transformer/encoder_norm/bias'])
    return x[:, 0] @ sd['head/kernel'] + sd['head/bias']


@pytest.fixture(scope='module')
def npz_and_conversion():
    sd = _make_npz(np.random.default_rng(0))
    params, kwargs = convert_vit_npz(sd)
    return sd, params, kwargs


def _images(seed=3, batch=2):
    return np.random.default_rng(seed).normal(
        size=(batch, IMG, IMG, 3)).astype(np.float32)


def test_logits_match_numpy_original(npz_and_conversion):
    sd, params, kwargs = npz_and_conversion
    assert kwargs['num_classes'] == CLASSES   # read off the head, not passed
    images = _images()
    ours = ViT(**kwargs, use_kernel=False).apply(
        {'params': params}, jnp.asarray(images), is_training=False)
    np.testing.assert_allclose(np.asarray(ours), _numpy_vit(sd, images),
                               atol=2e-4, rtol=2e-3)


def test_logits_match_under_auto_dispatch_and_scan(npz_and_conversion):
    sd, params, kwargs = npz_and_conversion
    images = _images(seed=7)
    stacked = dict(params)
    stacked['Encoder_0'] = stack_layer_params(params['Encoder_0'])
    ours = ViT(**kwargs, scan_layers=True).apply(   # use_kernel='auto'
        {'params': stacked}, jnp.asarray(images), is_training=False)
    np.testing.assert_allclose(np.asarray(ours), _numpy_vit(sd, images),
                               atol=2e-4, rtol=2e-3)


def test_param_tree_matches_init(npz_and_conversion):
    _, params, kwargs = npz_and_conversion
    model = ViT(**kwargs, use_kernel=False)
    init = model.init(jax.random.PRNGKey(0), jnp.ones((1, IMG, IMG, 3)),
                      is_training=False)['params']
    assert (jax.tree_util.tree_map(lambda a: a.shape, init)
            == jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params))


def test_pre_logits_checkpoint_imports_as_trunk():
    """in21k pretrain: pre_logits + its head are discarded; zero head of
    the requested width, trunk tensors imported unchanged."""
    sd = _make_npz(np.random.default_rng(1), pre_logits=True)
    params, kwargs = convert_vit_npz(sd, num_classes=7)
    assert kwargs['num_classes'] == 7
    assert not params['Dense_0']['kernel'].any()
    np.testing.assert_array_equal(
        params['Encoder_0']['EncoderBlock_0']['FFBlock_0']['Dense_0'
                                                           ]['kernel'],
        sd['Transformer/encoderblock_0/MlpBlock_3/Dense_0/kernel'])
    # still droppable into a fresh init
    init = ViT(**kwargs, use_kernel=False).init(
        jax.random.PRNGKey(0), jnp.ones((1, IMG, IMG, 3)),
        is_training=False)['params']
    assert (jax.tree_util.tree_map(lambda a: a.shape, init)
            == jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params))


def test_rejects_non_vit_npz():
    with pytest.raises(ValueError, match='missing keys'):
        convert_vit_npz({'some/other/tensor': np.zeros(3)})


def test_spec_roundtrip_through_npz_file(npz_and_conversion, tmp_path):
    """np.savez file -> converter -> model.json -> create_model, matching
    the numpy original end to end (the script's exact path, minus Orbax)."""
    import json

    sd, _, _ = npz_and_conversion
    buf = io.BytesIO()
    np.savez(buf, **sd)
    buf.seek(0)
    path = tmp_path / 'ckpt.npz'
    path.write_bytes(buf.read())
    with np.load(str(path)) as npz:
        params, kwargs = convert_vit_npz(npz)
    (tmp_path / 'model.json').write_text(json.dumps(model_spec(kwargs)))
    model = create_model(str(tmp_path / 'model.json'), use_kernel=False)
    images = _images(seed=11)
    ours = model.apply({'params': params}, jnp.asarray(images),
                       is_training=False)
    np.testing.assert_allclose(np.asarray(ours), _numpy_vit(sd, images),
                               atol=2e-4, rtol=2e-3)
