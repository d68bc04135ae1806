"""HF-transformers ViT import: logits must match torch within f32 noise.

This doubles as an independent cross-implementation check of our ViT math
(the golden-parity suite pins us to the reference; this pins us to a
second, widely-deployed implementation).
"""

import numpy as np
import pytest

transformers = pytest.importorskip('transformers')
torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sav_tpu.models.vit import ViT  # noqa: E402
from sav_tpu.models.factory import create_model  # noqa: E402
from sav_tpu.utils.hf_import import convert_hf_vit, model_spec  # noqa: E402
from sav_tpu.utils.stacking import stack_layer_params  # noqa: E402


@pytest.fixture(scope='module')
def hf_model_and_conversion():
    cfg = transformers.ViTConfig(
        hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=256, image_size=32, patch_size=8, num_labels=13,
        hidden_act='gelu')
    torch.manual_seed(0)
    hf = transformers.ViTForImageClassification(cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params, kwargs = convert_hf_vit(sd, cfg)
    return hf, params, kwargs


def _images(batch=2, size=32, seed=3):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(batch, size, size, 3)).astype(np.float32)


def _hf_logits(hf, images_nhwc):
    with torch.no_grad():
        out = hf(torch.from_numpy(images_nhwc.transpose(0, 3, 1, 2)))
    return out.logits.numpy()


def test_logits_match_torch(hf_model_and_conversion):
    hf, params, kwargs = hf_model_and_conversion
    images = _images()
    model = ViT(**kwargs, use_kernel=False)
    ours = model.apply({'params': params}, jnp.asarray(images),
                       is_training=False)
    np.testing.assert_allclose(np.asarray(ours), _hf_logits(hf, images),
                               atol=5e-4, rtol=5e-3)


def test_logits_match_under_auto_dispatch_and_scan(hf_model_and_conversion):
    hf, params, kwargs = hf_model_and_conversion
    images = _images(seed=7)
    stacked = dict(params)
    stacked['Encoder_0'] = stack_layer_params(params['Encoder_0'])
    model = ViT(**kwargs, scan_layers=True)   # use_kernel='auto'
    ours = model.apply({'params': stacked}, jnp.asarray(images),
                       is_training=False)
    np.testing.assert_allclose(np.asarray(ours), _hf_logits(hf, images),
                               atol=5e-4, rtol=5e-3)


def test_param_tree_matches_init(hf_model_and_conversion):
    """The converted tree must be droppable into a freshly-initialized
    model: identical structure and shapes (so optimizers/checkpoints just
    work)."""
    _, params, kwargs = hf_model_and_conversion
    model = ViT(**kwargs, use_kernel=False)
    init = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)),
                      is_training=False)['params']
    init_shapes = jax.tree_util.tree_map(lambda a: a.shape, init)
    ours_shapes = jax.tree_util.tree_map(lambda a: np.asarray(a).shape,
                                         params)
    assert init_shapes == ours_shapes


def test_model_spec_roundtrip(hf_model_and_conversion, tmp_path):
    """model.json -> create_model reproduces the imported architecture:
    same logits vs torch, both via the spec path and via the directory
    shorthand (a checkpoint dir containing model.json)."""
    import json

    hf, params, kwargs = hf_model_and_conversion
    spec = model_spec(kwargs)
    (tmp_path / 'model.json').write_text(json.dumps(spec))
    images = _images(seed=11)
    for name in (str(tmp_path / 'model.json'), str(tmp_path)):
        model = create_model(name, use_kernel=False)
        assert model.num_classes == 13      # spec wins over the default
        ours = model.apply({'params': params}, jnp.asarray(images),
                           is_training=False)
        np.testing.assert_allclose(np.asarray(ours),
                                   _hf_logits(hf, images),
                                   atol=5e-4, rtol=5e-3)


def test_trainable_after_import(hf_model_and_conversion):
    """Gradients flow and a step changes the imported params."""
    _, params, kwargs = hf_model_and_conversion
    model = ViT(**kwargs, use_kernel=False)
    images = jnp.asarray(_images())
    labels = jnp.array([1, 2])

    def loss_fn(p):
        logits = model.apply({'params': p}, images, is_training=True)
        return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(2), labels])

    grads = jax.grad(loss_fn)(
        jax.tree_util.tree_map(jnp.asarray, params))
    gnorm = sum(float(jnp.sum(jnp.square(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0.0
