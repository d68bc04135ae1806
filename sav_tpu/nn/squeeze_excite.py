"""Squeeze-and-excite gating block.

Checkpoint-compatible with the reference layer
(models/layers/squeeze_excite.py:13-38) — same attribute surface and
Dense_0/Dense_1 parameter layout — with its crash fixed: the reference
called the pooled tensor as a function (``jnp.mean(...)(inputs)``, l.32-33),
so the block could never actually execute.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn


class SqueezeExciteBlock(nn.Module):
    """Global-pool -> bottleneck MLP -> sigmoid channel gate."""

    se_ratio: Optional[float] = None
    hidden_ch: Optional[int] = None
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32

    def _bottleneck_width(self, channels: int) -> int:
        if self.se_ratio is not None:
            return max(1, int(channels * self.se_ratio))
        if self.hidden_ch is None:
            raise ValueError(
                'SqueezeExciteBlock needs se_ratio or hidden_ch')
        return self.hidden_ch

    @nn.compact
    def __call__(self, inputs):
        channels = inputs.shape[-1]
        # squeeze: one descriptor per channel, pooled over the spatial grid
        pooled = jnp.mean(inputs, axis=(1, 2), dtype=self.dtype,
                          keepdims=True)
        # excite: bottleneck -> activation -> per-channel sigmoid gate
        hidden = nn.Dense(self._bottleneck_width(channels), use_bias=True,
                          dtype=self.dtype)(pooled)
        gate = nn.Dense(channels, use_bias=True,
                        dtype=self.dtype)(self.activation_fn(hidden))
        return inputs * nn.sigmoid(gate)
