"""Regularization blocks (stochastic depth).

Behavior-compatible with the reference
(models/layers/regularization/stochastic_depth.py:6-28), with its
``scale_by_keep=False`` crash fixed (reference l.24-27 left ``x`` undefined).
Uses the ``'stochastic_depth'`` RNG stream.
"""

from __future__ import annotations

import jax
from flax import linen as nn


class StochasticDepthBlock(nn.Module):
    """Drops the whole residual branch per-sample with prob ``drop_rate``."""

    drop_rate: float
    scale_by_keep: bool = True

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        if not is_training or self.drop_rate == 0.0:
            return inputs

        keep_prob = 1.0 - self.drop_rate
        rng = self.make_rng('stochastic_depth')
        mask_shape = (inputs.shape[0],) + (1,) * (inputs.ndim - 1)
        mask = jax.random.bernoulli(rng, keep_prob, mask_shape)

        x = inputs / keep_prob if self.scale_by_keep else inputs
        return x * mask.astype(x.dtype)
