"""CvT convolutional-projection attention.

Checkpoint-compatible with the reference
(models/layers/attentions/cvt_attention.py:12-120). Queries/keys/values are
produced by depthwise-conv + BN + pointwise-conv projections on the 2-D token
grid (k/v at stride 2 by default, shrinking the attended sequence 4x); the
attention core is shared with every other attention variant via
``sav_tpu.ops.attention``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from sav_tpu.nn.attention import TalkingHeadsBlock
from sav_tpu.ops import attention as attention_ops


class ConvProjectionBlock(nn.Module):
    """Depthwise kxk conv -> BatchNorm -> 1x1 pointwise conv."""

    out_ch: int
    kernel_size: int = 3
    strides: int = 1
    use_bias: bool = True
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        in_ch = inputs.shape[-1]
        x = nn.Conv(features=in_ch,
                    kernel_size=(self.kernel_size,) * 2,
                    strides=(self.strides,) * 2,
                    padding='SAME',
                    feature_group_count=in_ch,
                    use_bias=False,
                    dtype=self.dtype)(inputs)
        x = nn.BatchNorm(use_running_average=not is_training,
                         momentum=self.bn_momentum,
                         epsilon=self.bn_epsilon,
                         dtype=self.dtype)(x)
        return nn.Conv(features=self.out_ch,
                       kernel_size=(1, 1),
                       use_bias=self.use_bias,
                       dtype=self.dtype)(x)


class CvTAttentionBlock(nn.Module):
    """MHA over a ``[B, H, W, C]`` grid with conv q/k/v projections."""

    num_heads: int
    head_ch: Optional[int] = None
    out_ch: Optional[int] = None
    talking_heads: bool = False
    attn_dropout_rate: float = 0.0
    out_dropout_rate: float = 0.0
    kernel_size: int = 3
    strides: Tuple[int, int, int] = (1, 2, 2)
    use_bias: bool = False
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    use_kernel: Union[str, bool] = 'auto'

    @nn.compact
    def __call__(self, inputs_q, inputs_kv, is_training: bool):
        assert inputs_q.ndim == 4 and inputs_kv.ndim == 4
        q_strides, k_strides, v_strides = self.strides

        in_ch = inputs_q.shape[-1]
        assert in_ch % self.num_heads == 0
        head_ch = self.head_ch or in_ch // self.num_heads
        out_ch = self.out_ch or in_ch

        projection = functools.partial(
            ConvProjectionBlock,
            out_ch=self.num_heads * head_ch,
            kernel_size=self.kernel_size,
            use_bias=self.use_bias,
            bn_momentum=self.bn_momentum,
            bn_epsilon=self.bn_epsilon,
            dtype=self.dtype,
        )
        query = projection(strides=q_strides)(inputs_q,
                                              is_training=is_training)
        key = projection(strides=k_strides)(inputs_kv,
                                            is_training=is_training)
        value = projection(strides=v_strides)(inputs_kv,
                                              is_training=is_training)

        split = functools.partial(rearrange,
                                  pattern='b H W (h d) -> b (H W) h d',
                                  h=self.num_heads)
        query, key, value = split(query), split(key), split(value)

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


class CvTSelfAttentionBlock(CvTAttentionBlock):
    """Self-attention variant of ``CvTAttentionBlock``."""

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        return super().__call__(inputs, inputs, is_training)
