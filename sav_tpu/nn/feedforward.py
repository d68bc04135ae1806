"""Feed-forward blocks: transformer MLP and CeiT's locally-enhanced FF.

Checkpoint-compatible with the reference
(models/layers/feedforwards/ff.py:8-34, leff.py:9-63).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Union

import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn


def _hidden_width(in_ch: int, expand_ratio: Optional[float],
                  hidden_ch: Optional[int]) -> int:
    if expand_ratio is None:
        if hidden_ch is None:
            raise ValueError('Must provide one of expand_ratio or hidden_ch')
        return hidden_ch
    return max(1, int(expand_ratio * in_ch))


class FFBlock(nn.Module):
    """Transformer MLP: Dense -> activation -> dropout -> Dense -> dropout.

    ``quantized=True`` routes both matmuls through the experimental int8
    forward path (parameter layout unchanged — 'Dense_0'/'Dense_1');
    ``quantized='ff'`` runs the whole sublayer (both GEMMs + gelu) as ONE
    int8 Pallas kernel with the hidden activation kept in VMEM
    (sav_tpu/ops/int8_ff.py) — requires gelu activation and zero dropout."""

    expand_ratio: Optional[float] = None
    hidden_ch: Optional[int] = None
    dropout_rate: float = 0.0
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32
    quantized: Union[bool, str] = False

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        in_ch = inputs.shape[-1]
        hidden_ch = _hidden_width(in_ch, self.expand_ratio, self.hidden_ch)
        if self.quantized in ('ff', 'ff_sb'):
            from sav_tpu.ops.int8_ff import int8_ff
            if self.dropout_rate:
                raise ValueError(
                    "quantized='ff' fuses the whole sublayer; dropout "
                    'between the GEMMs is not representable')
            if self.activation_fn is not nn.activation.gelu:
                raise ValueError(
                    "quantized='ff' hardcodes gelu between the GEMMs")
            w1, b1 = _DenseParams(in_ch, hidden_ch, name='Dense_0')()
            w2, b2 = _DenseParams(hidden_ch, in_ch, name='Dense_1')()
            return int8_ff(inputs.astype(self.dtype), w1.astype(self.dtype),
                           b1, w2.astype(self.dtype), b2,
                           switchback=self.quantized == 'ff_sb')
        if self.quantized:
            from sav_tpu.nn.quantized_dense import QuantizedDense

            def dense(features, name):
                return QuantizedDense(features=features, use_bias=True,
                                      dtype=self.dtype, name=name)
            x = dense(hidden_ch, 'Dense_0')(inputs)
            x = self.activation_fn(x)
            x = nn.Dropout(rate=self.dropout_rate,
                           deterministic=not is_training)(x)
            x = dense(in_ch, 'Dense_1')(x)
            return nn.Dropout(rate=self.dropout_rate,
                              deterministic=not is_training)(x)
        dense = functools.partial(nn.Dense, use_bias=True, dtype=self.dtype)

        x = dense(features=hidden_ch)(inputs)
        x = self.activation_fn(x)
        x = nn.Dropout(rate=self.dropout_rate,
                       deterministic=not is_training)(x)
        x = dense(features=in_ch)(x)
        return nn.Dropout(rate=self.dropout_rate,
                          deterministic=not is_training)(x)


class LeFFBlock(nn.Module):
    """CeiT locally-enhanced feed-forward.

    Splits the class token off, expands patch tokens with a Dense+BN+act,
    folds them back onto their 2-D grid for a depth-preserving conv, then
    projects back and re-attaches the class token
    (reference: models/layers/feedforwards/leff.py:19-63).
    """

    expand_ratio: Optional[float] = None
    hidden_ch: Optional[int] = None
    kernel_size: int = 5
    activation_fn: Callable = nn.activation.gelu
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        cls_token, tokens = inputs[:, :1], inputs[:, 1:]
        num_tokens, in_ch = tokens.shape[-2], tokens.shape[-1]
        hidden_ch = _hidden_width(in_ch, self.expand_ratio, self.hidden_ch)

        dense = functools.partial(nn.Dense, use_bias=True, dtype=self.dtype)
        batch_norm = functools.partial(
            nn.BatchNorm,
            use_running_average=not is_training,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
            dtype=self.dtype,
        )

        x = dense(features=hidden_ch)(tokens)
        x = batch_norm()(x)
        x = self.activation_fn(x)

        side = int(num_tokens ** 0.5)
        x = rearrange(x, 'b (h w) c -> b h w c', h=side, w=side)
        x = nn.Conv(features=hidden_ch,
                    kernel_size=(self.kernel_size, self.kernel_size),
                    padding='SAME',
                    dtype=self.dtype)(x)
        x = batch_norm()(x)
        x = self.activation_fn(x)
        x = rearrange(x, 'b h w c -> b (h w) c')

        x = dense(features=in_ch)(x)
        x = batch_norm()(x)
        x = self.activation_fn(x)

        return jnp.concatenate([cls_token, x], axis=1)


class _DenseParams(nn.Module):
    """``nn.Dense``-compatible (kernel, bias) leaves without the matmul."""

    in_ch: int
    out_ch: int

    @nn.compact
    def __call__(self):
        kernel = self.param('kernel',
                            nn.initializers.variance_scaling(
                                1.0, 'fan_in', 'truncated_normal'),
                            (self.in_ch, self.out_ch))
        bias = self.param('bias', nn.initializers.zeros, (self.out_ch,))
        return kernel, bias


class FFParams(nn.Module):
    """FFBlock's parameter tree (Dense_0/Dense_1) returned raw, for the
    layer-fused encoder path (``sav_tpu.ops.fused_layer.encoder_layer``).
    Named ``FFBlock_N`` by the caller, checkpoints load unchanged."""

    in_ch: int
    hidden_ch: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.in_ch, self.hidden_ch, name='Dense_0')()
        w2, b2 = _DenseParams(self.hidden_ch, self.in_ch, name='Dense_1')()
        return w1, b1, w2, b2
