"""MLP-Mixer (Tolstikhin et al., 2021) — attention-free token/channel mixing.

Checkpoint- and API-compatible with the reference (models/mlp_mixer.py:10-60).
The token-mixing MLP is expressed as FFBlock on the transposed ``[.., d, l]``
layout, exactly like the reference, so parameters stay drop-in compatible.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

from sav_tpu.nn import FFBlock, PatchEmbedBlock


class MixerBlock(nn.Module):
    """LN -> token-mixing MLP -> residual; LN -> channel-mixing -> residual."""

    tokens_expand_ratio: float
    channels_expand_ratio: float
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        def mlp(ratio, z):
            return FFBlock(expand_ratio=ratio,
                           activation_fn=self.activation_fn,
                           dtype=self.dtype)(z, is_training=is_training)

        # token mixing: transpose so the MLP contracts over the sequence
        # axis, then transpose back before the residual
        normed = nn.LayerNorm(dtype=self.dtype)(inputs)
        mixed = mlp(self.tokens_expand_ratio,
                    rearrange(normed, '... l d -> ... d l'))
        tokens = inputs + rearrange(mixed, '... d l -> ... l d')

        # channel mixing: an ordinary transformer MLP on the features
        channels = mlp(self.channels_expand_ratio,
                       nn.LayerNorm(dtype=self.dtype)(tokens))
        return tokens + channels


class ScanMixerBlock(MixerBlock):
    """MixerBlock with a scan-compatible (carry, broadcast) signature."""

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        return super().__call__(inputs, is_training=is_training), None


class MLPMixer(nn.Module):
    """MLP-Mixer classifier over NHWC images."""

    num_classes: int
    num_layers: int
    embed_dim: int
    patch_shape: Tuple[int, int]
    tokens_expand_ratio: float = 0.5
    channels_expand_ratio: float = 4
    activation_fn: Callable = nn.activation.gelu
    dtype: jnp.dtype = jnp.float32
    scan_layers: bool = False

    @nn.compact
    def __call__(self, inputs, is_training: bool):
        x = PatchEmbedBlock(patch_shape=self.patch_shape,
                            embed_dim=self.embed_dim,
                            use_bias=True,
                            dtype=self.dtype)(inputs)

        block_kwargs = dict(tokens_expand_ratio=self.tokens_expand_ratio,
                            channels_expand_ratio=self.channels_expand_ratio,
                            activation_fn=self.activation_fn,
                            dtype=self.dtype)
        if self.scan_layers:
            scanned = nn.scan(ScanMixerBlock,
                              variable_axes={'params': 0},
                              split_rngs={'params': True, 'dropout': True},
                              in_axes=nn.broadcast,
                              length=self.num_layers)
            x, _ = scanned(name='MixerBlock', **block_kwargs)(x, is_training)
        else:
            for _ in range(self.num_layers):
                x = MixerBlock(**block_kwargs)(x, is_training=is_training)

        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = jnp.mean(x, axis=1)
        return nn.Dense(features=self.num_classes, dtype=self.dtype)(x)
