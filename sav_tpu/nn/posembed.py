"""Positional embeddings: learned absolute, fixed sinusoidal, and rotary.

``AddAbsPosEmbed`` is checkpoint-compatible with the reference
(models/layers/position_embed.py:48-57). The fixed/rotary embeddings are
*working* replacements for the reference's broken, unused versions
(position_embed.py:23-45 references an undefined ``self.dtype`` and has an
operator-precedence bug in the frequency table; the reference README lists
rotary as TODO). We implement the standard formulations instead.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from einops import rearrange, repeat
from flax import linen as nn


class AddAbsPosEmbed(nn.Module):
    """Adds a learned absolute positional embedding of shape (1, L, D)."""

    embed_init: Callable = nn.initializers.normal(stddev=0.02)

    @nn.compact
    def __call__(self, inputs):
        assert inputs.ndim == 3
        pos_embed = self.param('pos_embed', self.embed_init,
                               (1, inputs.shape[1], inputs.shape[2]))
        return inputs + pos_embed


def sincos_frequencies(seq_len: int, dim: int,
                       dtype: jnp.dtype = jnp.float32,
                       base: float = 10000.0) -> jnp.ndarray:
    """Standard sinusoidal frequency table ``[seq_len, dim // 2]``."""
    exponent = jnp.arange(0, dim, 2, dtype=dtype) / dim
    inv_freq = 1.0 / (base ** exponent)
    positions = jnp.arange(seq_len, dtype=dtype)
    return jnp.einsum('i,j->ij', positions, inv_freq)


def rotate_every_two(x: jnp.ndarray) -> jnp.ndarray:
    """(x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...) on the last axis."""
    x1 = x[..., ::2]
    x2 = x[..., 1::2]
    return rearrange(jnp.stack((-x2, x1), axis=-1), '... d two -> ... (d two)')

def apply_rotary_pos_emb(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Applies rotary position embedding.

    Args:
      x: ``[..., seq_len, dim]``.
      freqs: ``[seq_len, dim // 2]`` angle table.
    """
    sin = repeat(jnp.sin(freqs), 'l d -> l (d two)', two=2).astype(x.dtype)
    cos = repeat(jnp.cos(freqs), 'l d -> l (d two)', two=2).astype(x.dtype)
    return x * cos + rotate_every_two(x) * sin


def apply_rotary_heads(x: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """Rotary embedding for per-head projections ``[..., seq, heads, dim]``.

    Same rotation as :func:`apply_rotary_pos_emb` but broadcast over the
    heads axis that sits between the sequence and feature axes (the q/k
    layout ``AttentionBlock`` produces).
    """
    sin = repeat(jnp.sin(freqs), 'l d -> l 1 (d two)', two=2).astype(x.dtype)
    cos = repeat(jnp.cos(freqs), 'l d -> l 1 (d two)', two=2).astype(x.dtype)
    return x * cos + rotate_every_two(x) * sin


class FixedPositionalEmbedding(nn.Module):
    """Fixed sinusoidal positional embedding added to the input."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, seq_axis: int = -2):
        seq_len, dim = inputs.shape[seq_axis], inputs.shape[-1]
        freqs = sincos_frequencies(seq_len, dim, dtype=jnp.float32)
        table = jnp.concatenate([jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
        return inputs + table.astype(self.dtype)


class RotaryPositionalEmbedding(nn.Module):
    """Rotary positional embedding applied to a ``[..., seq, dim]`` input."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, seq_axis: int = -2):
        seq_len, dim = inputs.shape[seq_axis], inputs.shape[-1]
        freqs = sincos_frequencies(seq_len, dim, dtype=jnp.float32)
        return apply_rotary_pos_emb(inputs, freqs)
