"""String-keyed model factory.

API-compatible with the reference ``create_model(model_name, num_classes,
dtype)`` (reference: models/create_model.py:6-215), covering all 29 config
names. Four reference factory bugs are fixed, keeping the names:

  * ``cvt-13`` / ``cvt-21`` stage-3 width 368 -> 384 (the CvT paper value;
    the reference's own cvt_test.py:14-15 uses 384).
  * ``tnt_s_patch16`` / ``tnt_b_patch16`` had each other's dimensions
    (create_model.py:50-63 vs the paper and tnt_test.py:14-15); swapped back.
  * ``mixer_b_patch16`` was unreachable (the reference defined
    ``mixer_s_patch32`` twice, create_model.py:184,199); restored.
  * ``mixer_l_patch16`` keeps the reference's 32-layer setting.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Dict

import jax.numpy as jnp

from sav_tpu.models.botnet import BoTNet
from sav_tpu.models.cait import CaiT
from sav_tpu.models.ceit import CeiT
from sav_tpu.models.cvt import CvT
from sav_tpu.models.mlp_mixer import MLPMixer
from sav_tpu.models.tnt import TNT
from sav_tpu.models.vit import ViT


def _vit(num_layers, num_heads, embed_dim, patch):
    return ViT, dict(num_layers=num_layers, num_heads=num_heads,
                     embed_dim=embed_dim, patch_shape=(patch, patch))


def _cait(num_layers, num_heads, embed_dim, stoch_depth_rate, layerscale_eps):
    return CaiT, dict(num_layers=num_layers, num_layers_token_only=2,
                      num_heads=num_heads, embed_dim=embed_dim,
                      patch_shape=(16, 16),
                      stoch_depth_rate=stoch_depth_rate,
                      layerscale_eps=layerscale_eps)


def _mixer(num_layers, embed_dim, patch):
    return MLPMixer, dict(num_layers=num_layers, embed_dim=embed_dim,
                          patch_shape=(patch, patch))


# name -> (model class, config kwargs). All 29 reference names, plus
# small-ViT extensions (vit_ti/vit_s) used by the smoke/bench entry points.
MODEL_CONFIGS: Dict[str, Any] = {
    'vit_ti_patch16': _vit(12, 3, 192, 16),
    'vit_s_patch32': _vit(12, 6, 384, 32),
    'vit_s_patch16': _vit(12, 6, 384, 16),
    'vit_b_patch32': _vit(12, 12, 768, 32),
    'vit_b_patch16': _vit(12, 12, 768, 16),
    'vit_l_patch32': _vit(24, 16, 1024, 32),
    'vit_l_patch16': _vit(24, 16, 1024, 16),
    'botnet_t3': (BoTNet, dict(stage_sizes=(3, 4, 6, 6))),
    'botnet_t4': (BoTNet, dict(stage_sizes=(3, 4, 23, 6))),
    'botnet_t5': (BoTNet, dict(stage_sizes=(3, 4, 23, 12))),
    'tnt_s_patch16': (TNT, dict(num_layers=12, inner_num_heads=4,
                                outer_num_heads=6, inner_embed_dim=24,
                                outer_embed_dim=384)),
    'tnt_b_patch16': (TNT, dict(num_layers=12, inner_num_heads=4,
                                outer_num_heads=10, inner_embed_dim=40,
                                outer_embed_dim=640)),
    'ceit_t': (CeiT, dict(num_layers=12, num_heads=3, embed_dim=192)),
    'ceit_s': (CeiT, dict(num_layers=12, num_heads=6, embed_dim=384)),
    'ceit_b': (CeiT, dict(num_layers=12, num_heads=12, embed_dim=768)),
    'cait_xxs_24': _cait(24, 4, 192, 0.05, 1e-5),
    'cait_xxs_36': _cait(36, 4, 192, 0.1, 1e-6),
    'cait_xs_24': _cait(24, 6, 288, 0.05, 1e-5),
    'cait_xs_36': _cait(36, 6, 288, 0.1, 1e-6),
    'cait_s_24': _cait(24, 8, 384, 0.1, 1e-6),
    'cait_s_36': _cait(36, 8, 384, 0.2, 1e-6),
    'cait_s_48': _cait(48, 8, 384, 0.3, 1e-6),
    'cait_m_24': _cait(24, 16, 768, 0.2, 1e-5),
    'cait_m_36': _cait(36, 16, 768, 0.3, 1e-6),
    'cait_m_48': _cait(48, 16, 768, 0.4, 1e-6),
    'cvt-13': (CvT, dict(stage_sizes=(1, 2, 10), num_heads=(1, 3, 6),
                         embed_dim=(64, 192, 384))),
    'cvt-21': (CvT, dict(stage_sizes=(1, 4, 16), num_heads=(1, 3, 6),
                         embed_dim=(64, 192, 384))),
    'cvt-w24': (CvT, dict(stage_sizes=(2, 2, 20), num_heads=(3, 12, 16),
                          embed_dim=(192, 768, 1024))),
    'mixer_s_patch32': _mixer(8, 512, 32),
    'mixer_s_patch16': _mixer(8, 512, 16),
    'mixer_b_patch32': _mixer(12, 768, 32),
    'mixer_b_patch16': _mixer(12, 768, 16),
    'mixer_l_patch32': _mixer(24, 1024, 32),
    'mixer_l_patch16': _mixer(32, 1024, 16),
}


def available_models():
    """All model names accepted by ``create_model``."""
    return sorted(MODEL_CONFIGS)


# Spec-file construction: checkpoint importers (scripts/import_hf_checkpoint
# .py) write a `model.json` describing an architecture outside the 29-name
# registry; every CLI then accepts `-m path/to/model.json`.
_SPEC_CLASSES = {'vit': ViT, 'cait': CaiT, 'ceit': CeiT, 'cvt': CvT,
                 'tnt': TNT, 'botnet': BoTNet, 'mixer': MLPMixer}


def _spec_activation(name: str):
    from flax import linen as nn
    table = {
        'gelu': nn.activation.gelu,                  # flax default: tanh
        'gelu_exact': functools.partial(nn.activation.gelu,
                                        approximate=False),
        'relu': nn.activation.relu,
    }
    try:
        return table[name]
    except KeyError:
        raise RuntimeError(
            f'unknown activation {name!r} in model spec; '
            f'known: {", ".join(sorted(table))}') from None


def _create_from_spec(path: str, num_classes, dtype, overrides):
    with open(path) as f:
        spec = json.load(f)
    try:
        model_cls = _SPEC_CLASSES[spec['model']]
    except KeyError:
        raise RuntimeError(
            f'model spec {path!r} names unknown model '
            f'{spec.get("model")!r}; known: '
            f'{", ".join(sorted(_SPEC_CLASSES))}') from None
    kwargs = {k: tuple(v) if isinstance(v, list) else v
              for k, v in spec.get('kwargs', {}).items()}
    if 'activation' in kwargs:
        kwargs['activation_fn'] = _spec_activation(kwargs.pop('activation'))
    # the spec's num_classes wins: CLIs pass their --num_classes default
    # unconditionally, and the checkpoint's head width is not negotiable
    kwargs.setdefault('num_classes', num_classes)
    kwargs['dtype'] = dtype
    kwargs.update(overrides)
    return model_cls, kwargs


def create_model(model_name: str,
                 num_classes: int = 1000,
                 dtype: jnp.dtype = jnp.float32,
                 **overrides):
    """Builds a model from its registry name or a ``model.json`` spec.

    Extra keyword arguments override config fields (e.g. ``use_kernel=False``
    to force the jnp attention path).

    ``model_name`` may also be a path to a JSON model spec (or a directory
    containing ``model.json``, e.g. an imported-checkpoint directory):
    ``{"model": "vit", "kwargs": {...}}`` with ``kwargs`` holding the
    constructor fields (lists become tuples; ``activation`` is a string key:
    gelu | gelu_exact | relu). Written by scripts/import_hf_checkpoint.py.
    """
    spec_path = None
    if model_name.endswith('.json'):
        spec_path = model_name
    elif (os.path.sep in model_name
          and os.path.isfile(os.path.join(model_name, 'model.json'))):
        spec_path = os.path.join(model_name, 'model.json')
    if spec_path is not None:
        model_cls, kwargs = _create_from_spec(spec_path, num_classes,
                                              dtype, overrides)
        num_classes = kwargs.pop('num_classes')
        dtype = kwargs.pop('dtype')
    else:
        try:
            model_cls, config = MODEL_CONFIGS[model_name]
        except KeyError:
            raise RuntimeError(
                f'Model not found: {model_name!r}. '
                f'Available: {", ".join(available_models())}') from None
        kwargs = dict(config)
        kwargs.update(overrides)
    fields = getattr(model_cls, '__dataclass_fields__', {})
    unknown = [k for k in overrides if fields and k not in fields]
    if unknown:
        hint = (' (--quantized is honored by the ViT, CaiT, Mixer and '
                'CvT families; this family has no int8 path)'
                if 'quantized' in unknown else '')
        raise RuntimeError(
            f'{model_cls.__name__} does not support '
            f'{", ".join(sorted(unknown))}{hint}; supported overrides: '
            f'{", ".join(sorted(set(fields) - {"parent", "name"}))}')
    return model_cls(num_classes=num_classes, dtype=dtype, **kwargs)
