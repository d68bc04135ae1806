"""Attention layer modules.

Parameter-holding linen modules; the math lives in ``sav_tpu.ops.attention``
(jnp path) and ``sav_tpu.ops.flash_attention`` (fused Pallas path). The
module hierarchy and parameter names are kept checkpoint-compatible with the
reference (models/layers/attentions/attention.py:10-74,
models/layers/attentions/talking_heads.py:5-14) so reference-trained
parameters drop in unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from sav_tpu.ops import attention as attention_ops


class TalkingHeadsBlock(nn.Module):
    """Learned head-mixing transform (talking-heads attention).

    Called with an array, mixes heads; called with no argument, returns the
    raw ``(num_heads, num_heads)`` transform so callers can fold the mix into
    a fused attention kernel.
    """

    num_heads: int

    @nn.compact
    def __call__(self, inputs=None):
        transform = self.param('talking_heads_transform',
                               nn.initializers.orthogonal(),
                               (self.num_heads, self.num_heads))
        if inputs is None:
            return transform
        return attention_ops.head_mix(inputs, transform)


class AttentionBlock(nn.Module):
    """Multi-head (cross-)attention with optional talking heads.

    Matches the reference semantics (models/layers/attentions/attention.py:
    10-67): q/k/v via DenseGeneral into ``(heads, head_dim)``, scaled-dot
    softmax with optional pre/post-softmax head mixing, attention dropout,
    merged output projection, output dropout.
    """

    num_heads: int
    head_ch: Optional[int] = None
    out_ch: Optional[int] = None
    talking_heads: bool = False
    attn_dropout_rate: float = 0.0
    out_dropout_rate: float = 0.0
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'

    @nn.compact
    def __call__(self, inputs_q, inputs_kv, is_training: bool):
        assert inputs_q.ndim == inputs_kv.ndim == 3
        in_ch = inputs_q.shape[-1]
        assert in_ch % self.num_heads == 0
        head_ch = self.head_ch or in_ch // self.num_heads
        out_ch = self.out_ch or in_ch

        projection = functools.partial(
            nn.DenseGeneral,
            axis=-1,
            features=(self.num_heads, head_ch),
            use_bias=self.use_bias,
            dtype=self.dtype,
        )
        query = projection(name='queries')(inputs_q)
        key = projection(name='keys')(inputs_kv)
        value = projection(name='values')(inputs_kv)

        pre_mix = post_mix = None
        if self.talking_heads:
            pre_mix = TalkingHeadsBlock(num_heads=self.num_heads)()
            post_mix = TalkingHeadsBlock(num_heads=self.num_heads)()

        dropout_rate = self.attn_dropout_rate if is_training else 0.0
        dropout_rng = (self.make_rng('dropout')
                       if dropout_rate > 0.0 else None)

        x = attention_ops.multi_head_attention(
            query, key, value,
            pre_softmax_transform=pre_mix,
            post_softmax_transform=post_mix,
            dropout_rate=dropout_rate,
            dropout_rng=dropout_rng,
            use_kernel=self.use_kernel,
        )

        output = nn.DenseGeneral(features=out_ch,
                                 axis=(-2, -1),
                                 use_bias=self.use_bias,
                                 dtype=self.dtype)(x)
        output = nn.Dropout(rate=self.out_dropout_rate)(
            output, deterministic=not is_training)
        return output


class SelfAttentionBlock(AttentionBlock):
    """Self-attention: queries, keys and values from the same sequence."""

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        return super().__call__(inputs, inputs, is_training=is_training)
