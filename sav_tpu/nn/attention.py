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


class _ProjectionParams(nn.Module):
    """DenseGeneral-compatible q/k/v parameters without the matmul.

    Declares the same ``kernel`` (``[in_ch, heads, head_dim]``) and optional
    ``bias`` (``[heads, head_dim]``) leaves as the reference's
    ``nn.DenseGeneral`` projections (models/layers/attentions/attention.py:
    29-37) and returns them raw, so the caller can concatenate several
    projections into one wide matmul (fused qkv) while keeping the checkpoint
    layout unchanged.
    """

    in_ch: int
    num_heads: int
    head_ch: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param(
            'kernel',
            # lecun-normal over the flattened (in, heads*head_dim) fans,
            # matching DenseGeneral's multi-axis init semantics
            nn.initializers.variance_scaling(
                1.0, 'fan_in', 'truncated_normal',
                in_axis=0, out_axis=(1, 2)),
            (self.in_ch, self.num_heads, self.head_ch))
        bias = (self.param('bias', nn.initializers.zeros,
                           (self.num_heads, self.head_ch))
                if self.use_bias else None)
        return kernel, bias


class LayerNormParams(nn.Module):
    """LayerNorm parameters (scale, bias) without the computation — for
    paths that fuse the normalization into a kernel (ops.fused_layer).
    Named ``LayerNorm_N`` by the caller, the leaves match ``nn.LayerNorm``
    checkpoints exactly."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param('scale', nn.initializers.ones, (self.dim,)),
                self.param('bias', nn.initializers.zeros, (self.dim,)))


class _OutProjectionParams(nn.Module):
    """The merged output-projection kernel of AttentionBlock's final
    ``DenseGeneral(axis=(-2, -1))`` — parameters only, same init/fan
    semantics (contracting axes (0, 1))."""

    num_heads: int
    head_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        return self.param(
            'kernel',
            nn.initializers.variance_scaling(1.0, 'fan_in',
                                             'truncated_normal',
                                             in_axis=(0, 1), out_axis=2),
            (self.num_heads, self.head_ch, self.out_ch))


class AttentionSublayerParams(nn.Module):
    """SelfAttentionBlock's parameter tree (queries/keys/values/
    DenseGeneral_0) returned raw, for the layer-fused sublayer path
    (``sav_tpu.ops.fused_layer``). Named ``SelfAttentionBlock_N`` by the
    caller, checkpoints trained on the standard path load unchanged."""

    in_ch: int
    num_heads: int
    head_ch: int
    # also declare the two [H, H] talking-heads transforms
    # (TalkingHeadsBlock_0/1, as AttentionBlock(talking_heads=True) names
    # them) and return them after wo — for ops.th_attention's fused span
    talking_heads: bool = False

    @nn.compact
    def __call__(self):
        params = functools.partial(_ProjectionParams, in_ch=self.in_ch,
                                   num_heads=self.num_heads,
                                   head_ch=self.head_ch, use_bias=False)
        wq, _ = params(name='queries')()
        wk, _ = params(name='keys')()
        wv, _ = params(name='values')()
        wo = _OutProjectionParams(num_heads=self.num_heads,
                                  head_ch=self.head_ch,
                                  out_ch=self.in_ch,
                                  name='DenseGeneral_0')()
        if not self.talking_heads:
            return wq, wk, wv, wo
        m_pre = TalkingHeadsBlock(num_heads=self.num_heads,
                                  name='TalkingHeadsBlock_0')()
        m_post = TalkingHeadsBlock(num_heads=self.num_heads,
                                   name='TalkingHeadsBlock_1')()
        return wq, wk, wv, wo, m_pre, m_post


class AttentionBlock(nn.Module):
    """Multi-head (cross-)attention with optional talking heads.

    Matches the reference semantics (models/layers/attentions/attention.py:
    10-67): q/kv via DenseGeneral into ``(heads, head_dim)``, scaled-dot
    softmax with optional pre/post-softmax head mixing, attention dropout,
    merged output projection, output dropout.

    ``fused_qkv=True`` issues the three ``[D, h*d]`` projection matmuls as
    ONE ``[D, 3*h*d]`` matmul (``[D, 2*h*d]`` for cross-attention k/v);
    parameters stay three separate leaves (``queries/keys/values``) so
    checkpoints are unchanged and the math is identical. It is OFF by
    default: measured on ViT-B/16 @224 bs=192 (v5e) the full train step is
    10% SLOWER fused (215.9 vs 193.5 ms/step) — the concat/split boundary
    around the wide matmul costs XLA more in fusion/layout than the wider
    MXU op gains at these shapes (see docs/PERFORMANCE.md).
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
    fused_qkv: bool = False
    # Rotary position embedding applied to q/k after projection (the
    # reference shipped rotary broken and unused, models/layers/
    # position_embed.py:23-45 + README TODO; here it is a first-class
    # attention option, parameter-free so checkpoints are unaffected).
    rotary: bool = False

    @nn.compact
    def __call__(self, inputs_q, inputs_kv, is_training: bool):
        assert inputs_q.ndim == inputs_kv.ndim == 3
        in_ch = inputs_q.shape[-1]
        assert in_ch % self.num_heads == 0
        head_ch = self.head_ch or in_ch // self.num_heads
        out_ch = self.out_ch or in_ch

        if self.fused_qkv:
            query, key, value = self._fused_projections(
                inputs_q, inputs_kv, in_ch, head_ch)
        else:
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

        if self.rotary:
            from sav_tpu.nn.posembed import (apply_rotary_heads,
                                             sincos_frequencies)
            assert head_ch % 2 == 0, 'rotary needs an even head dim'
            # queries and keys may differ in length (cross-attention);
            # absolute position tables rotate each independently and the
            # dot product sees only relative offsets
            query = apply_rotary_heads(
                query, sincos_frequencies(query.shape[-3], head_ch))
            key = apply_rotary_heads(
                key, sincos_frequencies(key.shape[-3], head_ch))

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

    def _fused_projections(self, inputs_q, inputs_kv, in_ch, head_ch):
        """q/k/v via one (self-attn) or two (cross-attn) wide matmuls."""
        params = functools.partial(
            _ProjectionParams,
            in_ch=in_ch, num_heads=self.num_heads, head_ch=head_ch,
            use_bias=self.use_bias)
        q_kernel, q_bias = params(name='queries')()
        k_kernel, k_bias = params(name='keys')()
        v_kernel, v_bias = params(name='values')()

        def project(inputs, kernels, biases):
            wide = jnp.concatenate(
                [k.reshape(in_ch, -1) for k in kernels], axis=-1)
            inputs, wide = nn.dtypes.promote_dtype(inputs, wide,
                                                   dtype=self.dtype)
            out = inputs @ wide
            outs = jnp.split(out, len(kernels), axis=-1)
            outs = [o.reshape(o.shape[:-1] + (self.num_heads, head_ch))
                    for o in outs]
            if self.use_bias:
                outs = [o + b.astype(o.dtype)
                        for o, b in zip(outs, biases)]
            return outs

        if inputs_q is inputs_kv:
            return project(inputs_q,
                           (q_kernel, k_kernel, v_kernel),
                           (q_bias, k_bias, v_bias))
        (query,) = project(inputs_q, (q_kernel,), (q_bias,))
        key, value = project(inputs_kv, (k_kernel, v_kernel),
                             (k_bias, v_bias))
        return query, key, value


class SelfAttentionBlock(AttentionBlock):
    """Self-attention: queries, keys and values from the same sequence."""

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        return super().__call__(inputs, inputs, is_training=is_training)
