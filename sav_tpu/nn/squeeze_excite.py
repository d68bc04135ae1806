"""Squeeze-and-excite gating block.

Behavior-compatible with the reference (models/layers/squeeze_excite.py:13-38)
with its crash fixed: the reference called the pooled tensor as a function
(``jnp.mean(...)(inputs)``, l.32-33); here the global average pool is just the
reduction.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn


class SqueezeExciteBlock(nn.Module):
    """Global-pool -> bottleneck MLP -> sigmoid channel gate."""

    se_ratio: Optional[float] = None
    hidden_ch: Optional[int] = None
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs):
        in_ch = inputs.shape[-1]
        if self.se_ratio is None:
            if self.hidden_ch is None:
                raise ValueError('Must provide one of se_ratio or hidden_ch')
            hidden_ch = self.hidden_ch
        else:
            hidden_ch = max(1, int(in_ch * self.se_ratio))

        dense = functools.partial(nn.Dense, use_bias=True, dtype=self.dtype)

        x = jnp.mean(inputs, axis=(1, 2), dtype=self.dtype, keepdims=True)
        x = dense(features=hidden_ch)(x)
        x = self.activation_fn(x)
        x = dense(features=in_ch)(x)
        return nn.sigmoid(x) * inputs
