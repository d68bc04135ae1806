"""Layer library: the reusable blocks every model in the zoo is built from.

Re-exports the same 14-block surface as the reference layer library
(reference: models/layers/__init__.py:1-7).
"""

from sav_tpu.nn.attention import (AttentionBlock, SelfAttentionBlock,
                                  TalkingHeadsBlock)
from sav_tpu.nn.cvt_attention import (ConvProjectionBlock, CvTAttentionBlock,
                                      CvTSelfAttentionBlock)
from sav_tpu.nn.feedforward import FFBlock, LeFFBlock
from sav_tpu.nn.normalization import LayerScaleBlock
from sav_tpu.nn.posembed import (AddAbsPosEmbed, FixedPositionalEmbedding,
                                 RotaryPositionalEmbedding,
                                 apply_rotary_pos_emb, rotate_every_two)
from sav_tpu.nn.regularization import StochasticDepthBlock
from sav_tpu.nn.squeeze_excite import SqueezeExciteBlock
from sav_tpu.nn.stems import Image2TokenBlock, PatchEmbedBlock, patchify

__all__ = [
    'AttentionBlock', 'SelfAttentionBlock', 'TalkingHeadsBlock',
    'ConvProjectionBlock', 'CvTAttentionBlock', 'CvTSelfAttentionBlock',
    'FFBlock', 'LeFFBlock', 'LayerScaleBlock', 'AddAbsPosEmbed',
    'FixedPositionalEmbedding', 'RotaryPositionalEmbedding',
    'apply_rotary_pos_emb', 'rotate_every_two', 'StochasticDepthBlock',
    'SqueezeExciteBlock', 'Image2TokenBlock', 'PatchEmbedBlock', 'patchify',
]
