"""scan-over-layers: stacked param layout, logit equivalence, converters."""

import jax
import jax.numpy as jnp
import numpy as np

from sav_tpu.models import ViT
from sav_tpu.utils.stacking import stack_layer_params, unstack_layer_params

KW = dict(num_classes=10, num_layers=3, num_heads=4, embed_dim=64,
          patch_shape=(16, 16))


def test_scan_params_are_stacked():
    model = ViT(**KW, scan_layers=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 3)),
                           is_training=False)
    block = variables['params']['Encoder_0']['EncoderBlock']
    kernel = block['SelfAttentionBlock_0']['queries']['kernel']
    assert kernel.shape[0] == 3   # leading layer axis


def test_scan_matches_unrolled_with_converted_params():
    unrolled = ViT(**KW, scan_layers=False)
    scanned = ViT(**KW, scan_layers=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    variables = unrolled.init(jax.random.PRNGKey(0), x, is_training=False)
    params = variables['params']
    stacked = dict(params)
    stacked['Encoder_0'] = stack_layer_params(params['Encoder_0'])

    a = unrolled.apply({'params': params}, x, is_training=False)
    b = scanned.apply({'params': stacked}, x, is_training=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                               rtol=1e-5)

    # roundtrip back to per-layer layout
    restored = unstack_layer_params(stacked['Encoder_0'])
    for leaf_a, leaf_b in zip(
            jax.tree_util.tree_leaves(params['Encoder_0']),
            jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(leaf_a), np.asarray(leaf_b))


def test_stack_passthrough():
    tree = {'LayerNorm_0': {'scale': jnp.ones(4)},
            'EncoderBlock_0': {'w': jnp.zeros(2)},
            'EncoderBlock_1': {'w': jnp.ones(2)}}
    stacked = stack_layer_params(tree)
    assert set(stacked) == {'LayerNorm_0', 'EncoderBlock'}
    assert stacked['EncoderBlock']['w'].shape == (2, 2)


def test_cait_scan_matches_unrolled():
    from sav_tpu.models import CaiT
    kwargs = dict(num_classes=10, num_layers=3, num_layers_token_only=1,
                  num_heads=4, embed_dim=64, patch_shape=(16, 16),
                  stoch_depth_rate=0.1, layerscale_eps=1e-5)
    unrolled = CaiT(**kwargs)
    scanned = CaiT(**kwargs, scan_layers=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    params = unrolled.init(jax.random.PRNGKey(0), x,
                           is_training=False)['params']
    stacked = dict(params)
    stacked['Encoder_0'] = stack_layer_params(params['Encoder_0'])

    a = unrolled.apply({'params': params}, x, is_training=False)
    b = scanned.apply({'params': stacked}, x, is_training=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                               rtol=1e-5)


def test_mixer_scan_matches_unrolled():
    from sav_tpu.models import MLPMixer
    kwargs = dict(num_classes=10, num_layers=3, embed_dim=64,
                  patch_shape=(16, 16))
    unrolled = MLPMixer(**kwargs)
    scanned = MLPMixer(**kwargs, scan_layers=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    params = unrolled.init(jax.random.PRNGKey(0), x,
                           is_training=False)['params']
    stacked = stack_layer_params(params, prefix='MixerBlock')

    a = unrolled.apply({'params': params}, x, is_training=False)
    b = scanned.apply({'params': stacked}, x, is_training=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                               rtol=1e-5)


def test_ceit_scan_matches_unrolled():
    from sav_tpu.models import CeiT
    kwargs = dict(num_classes=10, num_layers=3, num_heads=4, embed_dim=64)
    unrolled = CeiT(**kwargs)
    scanned = CeiT(**kwargs, scan_layers=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    variables = unrolled.init(jax.random.PRNGKey(0), x, is_training=False)
    stacked_params = dict(variables['params'])
    stacked_params['Encoder_0'] = stack_layer_params(
        variables['params']['Encoder_0'])
    stacked_stats = dict(variables['batch_stats'])
    stacked_stats['Encoder_0'] = stack_layer_params(
        variables['batch_stats']['Encoder_0'])

    a = unrolled.apply(variables, x, is_training=False)
    b = scanned.apply({'params': stacked_params,
                       'batch_stats': stacked_stats}, x, is_training=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                               rtol=1e-5)


def test_tnt_scan_matches_unrolled():
    from sav_tpu.models import TNT
    kwargs = dict(num_classes=10, num_layers=3, inner_num_heads=2,
                  outer_num_heads=4, inner_embed_dim=16, outer_embed_dim=64)
    unrolled = TNT(**kwargs)
    scanned = TNT(**kwargs, scan_layers=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    params = unrolled.init(jax.random.PRNGKey(0), x,
                           is_training=False)['params']
    stacked = dict(params)
    stacked['Encoder_0'] = stack_layer_params(params['Encoder_0'])

    a = unrolled.apply({'params': params}, x, is_training=False)
    b = scanned.apply({'params': stacked}, x, is_training=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                               rtol=1e-5)


def test_cvt_scan_matches_unrolled():
    from sav_tpu.models import CvT
    kwargs = dict(num_classes=10, stage_sizes=(1, 2, 3),
                  num_heads=(1, 2, 4), embed_dim=(16, 32, 64))
    # scan engages only for stages deeper than 2 blocks (stage 3 here)
    unrolled = CvT(**kwargs)
    scanned = CvT(**kwargs, scan_layers=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))

    variables = unrolled.init(jax.random.PRNGKey(0), x, is_training=False)

    def stack_stage(tree):
        # first StageBlock stays peeled (scan carry must be shape-stable);
        # the rest stack under 'StageBlock'
        out = dict(tree)
        for key in list(out):
            if not key.startswith('Stage_'):
                continue
            stage = dict(out[key])
            blocks = sorted((k for k in stage if k.startswith('StageBlock_')),
                            key=lambda k: int(k.split('_')[1]))
            if len(blocks) > 2:
                rest = {f'StageBlock_{i}': stage.pop(b)
                        for i, b in enumerate(blocks[1:])}
                stage.update(stack_layer_params(rest, prefix='StageBlock'))
            out[key] = stage
        return out

    converted = {'params': stack_stage(variables['params']),
                 'batch_stats': stack_stage(variables['batch_stats'])}
    a = unrolled.apply(variables, x, is_training=False)
    b = scanned.apply(converted, x, is_training=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                               rtol=1e-5)
