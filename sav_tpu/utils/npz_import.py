"""Import google-research `vision_transformer` (AugReg) npz ViT checkpoints.

Second half of the interop surface started by :mod:`sav_tpu.utils.hf_import`:
the canonical JAX ViT releases ("How to train your ViT", AugReg / original
ViT paper checkpoints) ship as flat ``.npz`` files keyed like
``Transformer/encoderblock_0/MultiHeadDotProductAttention_1/query/kernel``.
Their tensors are flax-native, so the conversion is mostly re-nesting:

- q/k/v kernels are already ``[D, H, head]`` and the out-projection
  ``[H, head, D]`` — exactly our DenseGeneral shapes (no transposes; torch
  checkpoints need them, see hf_import.py).
- the conv patch embedding ``[ph, pw, C, D]`` reshapes row-major to our
  patchify-Dense kernel ``[ph*pw*C, D]`` (same linear map: our patchify
  flattens each patch in ``(ph, pw, c)`` order, reference
  models/layers/stems/patch_embed.py:16-24).
- the patch-embedding *bias* has no slot in our bias-free PatchEmbedBlock;
  a per-channel constant added to every patch token is exactly an additive
  position-embedding offset, so it folds into ``pos_embed[:, 1:, :]``.
- their ``LayerNorm_0``/``LayerNorm_2`` become our ``LayerNorm_0``/
  ``LayerNorm_1``; epsilons agree (both flax defaults, 1e-6).
- their MLP/attention activations match our defaults (tanh-approximate
  gelu, q/sqrt(head) scaling), so no activation override is needed.

in21k pretrains carry a ``pre_logits`` bottleneck (Dense D->D + tanh)
between the final LayerNorm and the 21k head. Our ViT (like the reference,
models/vit.py:95-98) has no such layer, and the standard transfer recipe
discards it together with the head (AugReg fine-tunes do exactly that), so
``pre_logits`` checkpoints import as trunks with a zero-initialized
``num_classes`` head — the same fine-tune-ready start hf_import produces
for headless torch checkpoints.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def convert_vit_npz(npz: Mapping[str, np.ndarray],
                    num_classes: int = 1000) -> Tuple[Dict[str, Any],
                                                      Dict[str, Any]]:
    """AugReg/vision_transformer npz -> (params, model_kwargs).

    Args:
      npz: mapping of flat ``a/b/c`` tensor names to arrays (a loaded
        ``np.load(path)`` handle works as-is).
      num_classes: head width when the checkpoint's own head is unusable
        (``pre_logits`` present) or absent; ignored otherwise.

    Returns:
      params: per-layer flax param tree for :class:`sav_tpu.models.vit.ViT`
        (``attn_bias=True`` geometry); stack ``params['Encoder_0']`` with
        ``sav_tpu.utils.stacking.stack_layer_params`` for scan models.
      model_kwargs: ViT constructor kwargs reproducing the architecture.
    """
    sd = {k: np.asarray(v) for k, v in npz.items()}
    missing = [k for k in ('embedding/kernel', 'cls', 'head/kernel',
                           'Transformer/posembed_input/pos_embedding',
                           'Transformer/encoder_norm/scale')
               if k not in sd]
    if missing:
        raise ValueError(
            'not a vision_transformer ViT npz checkpoint; missing keys: '
            + ', '.join(missing))

    proj = sd['embedding/kernel']                     # [ph, pw, C, D]
    ph, pw, _, dim = proj.shape
    patch_kernel = proj.reshape(-1, dim)
    pos = sd['Transformer/posembed_input/pos_embedding'].copy()
    pos[:, 1:, :] += sd['embedding/bias']

    blocks = sorted(
        {int(k.split('/')[1].rsplit('_', 1)[1])
         for k in sd if k.startswith('Transformer/encoderblock_')})
    if blocks != list(range(len(blocks))):
        raise ValueError(f'non-contiguous encoder blocks in npz: {blocks}')
    q = sd['Transformer/encoderblock_0/'
           'MultiHeadDotProductAttention_1/query/kernel']
    heads, head = q.shape[1], q.shape[2]

    def ln(key):
        return {'scale': sd[key + '/scale'], 'bias': sd[key + '/bias']}

    encoder: Dict[str, Any] = {
        'AddAbsPosEmbed_0': {'pos_embed': pos},
        'LayerNorm_0': ln('Transformer/encoder_norm'),
    }
    for i in blocks:
        p = f'Transformer/encoderblock_{i}/'
        a = p + 'MultiHeadDotProductAttention_1/'
        encoder[f'EncoderBlock_{i}'] = {
            'LayerNorm_0': ln(p + 'LayerNorm_0'),
            'SelfAttentionBlock_0': {
                'queries': {'kernel': sd[a + 'query/kernel'],
                            'bias': sd[a + 'query/bias']},
                'keys': {'kernel': sd[a + 'key/kernel'],
                         'bias': sd[a + 'key/bias']},
                'values': {'kernel': sd[a + 'value/kernel'],
                           'bias': sd[a + 'value/bias']},
                'DenseGeneral_0': {'kernel': sd[a + 'out/kernel'],
                                   'bias': sd[a + 'out/bias']},
            },
            'LayerNorm_1': ln(p + 'LayerNorm_2'),
            'FFBlock_0': {
                'Dense_0': {'kernel': sd[p + 'MlpBlock_3/Dense_0/kernel'],
                            'bias': sd[p + 'MlpBlock_3/Dense_0/bias']},
                'Dense_1': {'kernel': sd[p + 'MlpBlock_3/Dense_1/kernel'],
                            'bias': sd[p + 'MlpBlock_3/Dense_1/bias']},
            },
        }

    if 'pre_logits/kernel' in sd:       # in21k pretrain: discard bottleneck
        head_params = {'kernel': np.zeros((dim, num_classes), np.float32),
                       'bias': np.zeros((num_classes,), np.float32)}
    else:
        head_params = {'kernel': sd['head/kernel'],
                       'bias': sd['head/bias']}
        num_classes = sd['head/kernel'].shape[1]
    params: Dict[str, Any] = {
        'PatchEmbedBlock_0': {'Dense_0': {'kernel': patch_kernel}},
        'cls': sd['cls'],
        'Encoder_0': encoder,
        'Dense_0': head_params,
    }
    hidden = sd['Transformer/encoderblock_0/MlpBlock_3/Dense_0/kernel'
                ].shape[1]
    from flax import linen as nn
    model_kwargs = dict(
        num_classes=num_classes,
        num_layers=len(blocks),
        num_heads=heads,
        embed_dim=dim,
        patch_shape=(ph, pw),
        expand_ratio=hidden / dim,
        attn_bias=True,
        activation_fn=nn.activation.gelu,   # their nn.gelu default (tanh)
    )
    assert heads * head == dim, (heads, head, dim)
    return params, model_kwargs
