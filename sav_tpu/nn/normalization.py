"""Normalization-adjacent blocks (CaiT LayerScale).

Checkpoint-compatible with the reference
(models/layers/normalizations/layerscale.py:5-23).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class LayerScaleBlock(nn.Module):
    """Per-channel learned scale, initialized to a small constant ``eps``."""

    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, *unused_args, **unused_kwargs):
        scale = self.param(
            'layerscale',
            lambda key, shape: jnp.full(shape, self.eps, dtype=self.dtype),
            (inputs.shape[-1],))
        return inputs * jnp.asarray(scale, self.dtype)
