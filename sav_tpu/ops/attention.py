"""Functional multi-head attention core.

This is the compute tier of the framework: pure functions on arrays, no
parameters. The linen modules in ``sav_tpu.nn`` hold parameters and call into
here; the Pallas flash-attention kernels in ``sav_tpu.ops.flash_attention``
plug in behind :func:`multi_head_attention` via the ``use_kernel`` switch.

Semantics match the reference attention math
(reference: models/layers/attentions/attention.py:39-58):

  * queries are pre-scaled by ``1/sqrt(head_dim)`` before the logits matmul,
  * logits = einsum('...qhd,...khd->...hqk', q, k),
  * optional pre-softmax head-mixing (talking heads), softmax, optional
    post-softmax head-mixing,
  * optional additive bias (used by BoTNet relative-position logits),
  * attention dropout, then the value matmul back to '...qhd'.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def head_mix(weights: jax.Array, transform: jax.Array) -> jax.Array:
    """Mixes attention heads with a learned (num_heads, num_heads) matrix.

    ``weights`` has heads on axis 1 (``[batch, heads, ...]``); output head i is
    ``sum_h transform[h, i] * weights[:, h]`` (reference:
    models/layers/attentions/talking_heads.py:13).
    """
    return jnp.einsum('hi,bh...->bi...', transform, weights)


def attention_weights(
    query: jax.Array,
    key: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    pre_softmax_transform: Optional[jax.Array] = None,
    post_softmax_transform: Optional[jax.Array] = None,
) -> jax.Array:
    """Computes normalized attention weights ``[..., heads, q_len, kv_len]``.

    ``query``/``key`` are ``[..., len, heads, head_dim]``; the query must
    already be scaled (see ``multi_head_attention``).
    """
    weights = jnp.einsum('...qhd,...khd->...hqk', query, key)
    if bias is not None:
        weights = weights + bias
    if pre_softmax_transform is not None:
        weights = head_mix(weights, pre_softmax_transform)
    weights = jax.nn.softmax(weights)
    if post_softmax_transform is not None:
        weights = head_mix(weights, post_softmax_transform)
    return weights


def multi_head_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    *,
    bias: Optional[jax.Array] = None,
    pre_softmax_transform: Optional[jax.Array] = None,
    post_softmax_transform: Optional[jax.Array] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    use_kernel: str | bool = 'auto',
) -> jax.Array:
    """Scaled-dot-product multi-head attention.

    Args:
      query: ``[..., q_len, heads, head_dim]`` (unscaled).
      key, value: ``[..., kv_len, heads, head_dim]``.
      bias: optional additive logits bias broadcastable to
        ``[..., heads, q_len, kv_len]``.
      pre_softmax_transform / post_softmax_transform: optional
        ``(heads, heads)`` talking-heads matrices.
      dropout_rate / dropout_rng: attention-probability dropout.
      use_kernel: 'auto' picks the fused Pallas kernel when the shape/feature
        combination supports it; True forces it; False forces the jnp path.

    Returns:
      ``[..., q_len, heads, head_dim]`` attention output (pre output-projection).
    """
    head_dim = query.shape[-1]
    query = query / jnp.sqrt(head_dim).astype(query.dtype)

    if use_kernel is not False:
        from sav_tpu.ops import flash_attention  # local import: avoids cycle

        if use_kernel in (True, 'kernel'):
            mode = 'kernel'
        elif use_kernel == 'hybrid':
            mode = 'hybrid'
        else:
            mode = flash_attention.dispatch_mode(
                query, key, value,
                bias=bias,
                pre_softmax_transform=pre_softmax_transform,
                post_softmax_transform=post_softmax_transform,
                dropout_rate=dropout_rate,
            )
        if mode == 'kernel':
            return flash_attention.mha(
                query, key, value,
                bias=bias,
                pre_softmax_transform=pre_softmax_transform,
                post_softmax_transform=post_softmax_transform,
            )
        if mode == 'hybrid':
            return flash_attention.mha_hybrid(query, key, value)

    if (query.shape[-3] == 1 and bias is None
            and pre_softmax_transform is None
            and post_softmax_transform is None
            and not (dropout_rate > 0.0 and dropout_rng is not None)):
        # 1-query class attention (CaiT/CeiT heads, reference cait.py:10-15,
        # ceit.py:11-16): squeeze the length-1 query axis so the epilogue is
        # two [..., H, L]-shaped contractions around the softmax — measured
        # 8.4% faster than the 4-D form at CaiT @224 shapes on v5e
        # (benchmarks/cait_classattn_probe.py).
        q = query[..., 0, :, :]
        logits = jnp.einsum('...hd,...khd->...hk', q, key)
        p = jax.nn.softmax(logits).astype(value.dtype)
        out = jnp.einsum('...hk,...khd->...hd', p, value)
        return out[..., None, :, :]

    weights = attention_weights(
        query, key,
        bias=bias,
        pre_softmax_transform=pre_softmax_transform,
        post_softmax_transform=post_softmax_transform,
    )
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    weights.shape)
        weights = weights * keep.astype(weights.dtype) / (1.0 - dropout_rate)
    return jnp.einsum('...hqk,...khd->...qhd', weights, value)
