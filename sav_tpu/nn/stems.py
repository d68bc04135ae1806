"""Tokenization stems: linear patch embedding and CeiT's Image2Token stem.

Checkpoint-compatible with the reference
(models/layers/stems/patch_embed.py:8-26, image_to_token.py:8-48).

The patchify rearrange + Dense pair is mathematically a strided conv; the
rearrange formulation keeps the weight layout ``(ph*pw*c, embed_dim)`` which
XLA maps straight onto the MXU as one large matmul over all patches.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn


def patchify(images: jnp.ndarray, patch_shape: Tuple[int, int]) -> jnp.ndarray:
    """[B, H, W, C] -> [B, num_patches, ph*pw*C] (row-major patch order)."""
    ph, pw = patch_shape
    return rearrange(images, 'b (h ph) (w pw) c -> b (h w) (ph pw c)',
                     ph=ph, pw=pw)


class PatchEmbedBlock(nn.Module):
    """Non-overlapping patch extraction followed by a linear embedding."""

    patch_shape: Tuple[int, int]
    embed_dim: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, *unused_args, **unused_kwargs):
        x = patchify(inputs, self.patch_shape)
        return nn.Dense(features=self.embed_dim,
                        use_bias=self.use_bias,
                        dtype=self.dtype)(x)


class Image2TokenBlock(nn.Module):
    """CeiT I2T stem: conv -> BN -> max-pool -> patchify -> linear embed."""

    patch_shape: Tuple[int, int]
    num_ch: int
    conv_kernel_size: int
    conv_stride: int
    pool_window_size: int
    pool_stride: int
    embed_dim: int
    use_bias: bool = False
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        ph, pw = self.patch_shape
        x = nn.Conv(features=self.num_ch,
                    use_bias=self.use_bias,
                    kernel_size=(self.conv_kernel_size,) * 2,
                    strides=(self.conv_stride,) * 2,
                    padding=[(ph, ph), (pw, pw)],
                    dtype=self.dtype)(inputs)
        x = nn.BatchNorm(use_running_average=not is_training,
                         momentum=self.bn_momentum,
                         epsilon=self.bn_epsilon,
                         dtype=self.dtype)(x)
        x = nn.max_pool(x,
                        window_shape=(self.pool_window_size,) * 2,
                        strides=(self.pool_stride,) * 2)
        x = patchify(x, self.patch_shape)
        return nn.Dense(features=self.embed_dim,
                        use_bias=self.use_bias,
                        dtype=self.dtype)(x)
