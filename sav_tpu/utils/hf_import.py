"""Import HuggingFace-transformers ViT checkpoints into sav_tpu's ViT.

Interop surface the reference never had: a user holding a
`transformers.ViTForImageClassification` checkpoint (e.g.
``google/vit-base-patch16-224``) can convert it to this framework's
parameter tree and train/evaluate/serve it here. The conversion is exact —
per-tensor transposes/reshapes plus one algebraic fold:

- HF's conv patch projection ``[D, C, ph, pw]`` becomes our patchify-Dense
  kernel ``[ph*pw*C, D]`` (the two are the same linear map; our row-major
  patch flatten order matches the transpose ``(ph, pw, C, D)``).
- HF's patch-projection *bias* has no slot in our tree (the reference's
  PatchEmbedBlock is bias-free, reference models/layers/stems/
  patch_embed.py:12); since a per-channel constant added to every patch
  token is indistinguishable from the learned additive position embedding,
  it is folded into ``pos_embed[:, 1:, :]`` exactly.
- q/k/v/out projection biases map onto ``ViT(attn_bias=True)``.
- torch ``Linear`` stores ``[out, in]``; every kernel is transposed, and
  q/k/v reshape to ``(D, H, head)`` / out-proj to ``(H, head, D)`` —
  heads-major on both sides, matching HF's ``transpose_for_scores``.

HF's ``hidden_act='gelu'`` is the exact (erf) gelu; flax's default is the
tanh approximation, so the returned model kwargs carry the matching
``activation_fn``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import numpy as np


def _act_fn(hidden_act: str):
    from flax import linen as nn

    if hidden_act == 'gelu':                       # transformers: erf gelu
        return functools.partial(nn.gelu, approximate=False)
    if hidden_act in ('gelu_new', 'gelu_fast', 'gelu_pytorch_tanh'):
        return nn.gelu                             # tanh approximation
    raise ValueError(f'unsupported hidden_act {hidden_act!r} for ViT import')


def model_spec(model_kwargs: Dict[str, Any],
               scan_layers: bool = False) -> Dict[str, Any]:
    """JSON-serializable spec for ``create_model('<dir>/model.json')``.

    Inverse of the factory's spec decode: ``activation_fn`` becomes the
    string key the factory understands, everything else passes through.
    """
    kw = dict(model_kwargs)
    act = kw.pop('activation_fn')
    exact = getattr(act, 'keywords', {}).get('approximate') is False
    kw['activation'] = 'gelu_exact' if exact else 'gelu'
    kw['patch_shape'] = list(kw['patch_shape'])
    if scan_layers:
        kw['scan_layers'] = True
    return {'model': 'vit', 'kwargs': kw}


def convert_hf_vit(state_dict: Dict[str, np.ndarray],
                   config: Any,
                   num_classes: int = 1000) -> Tuple[Dict[str, Any],
                                                     Dict[str, Any]]:
    """HF ViT weights -> (params, model_kwargs).

    Accepts both ``ViTForImageClassification`` checkpoints and headless
    ``ViTModel`` ones (e.g. the in21k pretrains, whose tensor names carry
    no ``vit.`` prefix and which have no classifier): a missing classifier
    becomes a zero-initialized head of ``num_classes`` outputs — exactly
    this framework's fresh-head init (the reference zero-inits classifier
    kernels, vit.py:96-98), i.e. the standard import-then-fine-tune start.

    Args:
      state_dict: tensor name -> numpy array (call ``.numpy()`` on torch
        tensors first, or pass a loaded safetensors dict).
      config: the HF ViTConfig (attribute access) or a plain dict with the
        same field names.
      num_classes: head width when the checkpoint has no classifier
        (ignored otherwise — the checkpoint's head width wins).

    Returns:
      params: a per-layer (non-scan) flax param tree for :class:`ViT`;
        stack with ``sav_tpu.utils.stacking.stack_layer_params`` for
        ``scan_layers=True`` models.
      model_kwargs: constructor kwargs (num_classes, num_layers, num_heads,
        embed_dim, patch_shape, expand_ratio, attn_bias, activation_fn)
        reproducing the HF architecture; pass to :class:`ViT` directly.
    """
    cfg = config if isinstance(config, dict) else {
        k: getattr(config, k)
        for k in ('hidden_size', 'num_hidden_layers', 'num_attention_heads',
                  'intermediate_size', 'patch_size', 'hidden_act')}
    dim = cfg['hidden_size']
    num_layers = cfg['num_hidden_layers']
    heads = cfg['num_attention_heads']
    head = dim // heads
    patch = cfg['patch_size']

    prefix = 'vit.' if any(k.startswith('vit.') for k in state_dict) else ''
    sd = {(k[len(prefix):] if k.startswith(prefix) else k): np.asarray(v)
          for k, v in state_dict.items()}

    def t(key):                       # torch Linear [out, in] -> [in, out]
        return sd[key].T

    proj = sd['embeddings.patch_embeddings.projection.weight']
    patch_kernel = proj.transpose(2, 3, 1, 0).reshape(-1, dim)
    pos = sd['embeddings.position_embeddings'].copy()
    # fold the conv bias into the patch slots of the position embedding
    pos[:, 1:, :] += sd['embeddings.patch_embeddings.projection.bias']

    encoder: Dict[str, Any] = {
        'AddAbsPosEmbed_0': {'pos_embed': pos},
        'LayerNorm_0': {'scale': sd['layernorm.weight'],
                        'bias': sd['layernorm.bias']},
    }
    for i in range(num_layers):
        p = f'encoder.layer.{i}.'
        encoder[f'EncoderBlock_{i}'] = {
            'LayerNorm_0': {'scale': sd[p + 'layernorm_before.weight'],
                            'bias': sd[p + 'layernorm_before.bias']},
            'SelfAttentionBlock_0': {
                **{ours: {
                    'kernel': t(p + f'attention.attention.{theirs}.weight'
                                ).reshape(dim, heads, head),
                    'bias': sd[p + f'attention.attention.{theirs}.bias'
                               ].reshape(heads, head)}
                   for ours, theirs in (('queries', 'query'),
                                        ('keys', 'key'),
                                        ('values', 'value'))},
                'DenseGeneral_0': {
                    'kernel': t(p + 'attention.output.dense.weight'
                                ).reshape(heads, head, dim),
                    'bias': sd[p + 'attention.output.dense.bias']},
            },
            'LayerNorm_1': {'scale': sd[p + 'layernorm_after.weight'],
                            'bias': sd[p + 'layernorm_after.bias']},
            'FFBlock_0': {
                'Dense_0': {'kernel': t(p + 'intermediate.dense.weight'),
                            'bias': sd[p + 'intermediate.dense.bias']},
                'Dense_1': {'kernel': t(p + 'output.dense.weight'),
                            'bias': sd[p + 'output.dense.bias']},
            },
        }

    if 'classifier.weight' in sd:
        head_params = {'kernel': t('classifier.weight'),
                       'bias': sd['classifier.bias']}
        num_classes = sd['classifier.weight'].shape[0]
    else:                                   # headless (ViTModel) checkpoint
        head_params = {'kernel': np.zeros((dim, num_classes), np.float32),
                       'bias': np.zeros((num_classes,), np.float32)}
    params: Dict[str, Any] = {
        'PatchEmbedBlock_0': {'Dense_0': {'kernel': patch_kernel}},
        'cls': sd['embeddings.cls_token'],
        'Encoder_0': encoder,
        'Dense_0': head_params,
    }
    model_kwargs = dict(
        num_classes=num_classes,
        num_layers=num_layers,
        num_heads=heads,
        embed_dim=dim,
        patch_shape=(patch, patch),
        expand_ratio=cfg['intermediate_size'] / dim,
        attn_bias=True,
        activation_fn=_act_fn(cfg['hidden_act']),
    )
    return params, model_kwargs
