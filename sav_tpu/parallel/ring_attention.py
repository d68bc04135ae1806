"""Ring attention: sequence-parallel exact attention over a mesh axis.

The reference materializes every attention map on one device and never
shards the sequence (reference: models/layers/attentions/attention.py:41-58;
SURVEY §5 "long-context: ABSENT"). This implements the TPU-native scaling
path: shard the sequence over a mesh axis, keep q local, and rotate k/v
shards around the ring with ``jax.lax.ppermute`` while accumulating the
softmax online (FlashAttention-style m/l carry) — every device sees every
key with only ICI neighbor traffic, O(L/N) memory per device, and the
compute of step i overlapping the transfer of step i+1 (XLA schedules the
ppermute DMA concurrently with the einsums).

Composable with the blockwise Pallas kernel: each per-ring-step partial
attention is an ordinary (q_local, kv_shard) attention; on TPU backends the
local step routes through ``sav_tpu.ops.flash_attention`` shapes when they
qualify. The ring layer itself is pure lax, so it runs identically on the
8-device CPU test mesh.

Usage (inside ``shard_map`` over a mesh with a sequence axis):

    out = ring_self_attention(x_shard, axis_name='sp', num_heads=H)

or at the array level with explicit q/k/v shards:

    out = ring_attention(q_shard, k_shard, v_shard, axis_name='sp')
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e30


def ring_attention(query, key, value, *, axis_name: str):
    """Exact softmax attention with k/v sharded over ``axis_name``.

    Args:
      query: local shard ``[B, Lq_local, H, D]`` (UNscaled — scaling by
        ``1/sqrt(D)`` happens here, matching
        ``sav_tpu.ops.attention.multi_head_attention``).
      key, value: local shards ``[B, Lkv_local, H, D]``.
      axis_name: mesh axis the sequence is sharded over.

    Returns:
      ``[B, Lq_local, H, D]`` — identical (up to float re-association) to
      gathering all k/v and running full attention.
    """
    axis_size = jax.lax.psum(1, axis_name)
    batch, q_len, heads, d = query.shape
    query = query / jnp.sqrt(d).astype(query.dtype)

    acc = jnp.zeros((batch, heads, q_len, d), jnp.float32)
    m = jnp.full((batch, heads, q_len), NEG_INF, jnp.float32)
    l = jnp.zeros((batch, heads, q_len), jnp.float32)
    # the softmax accumulators become device-varying after one ring step
    # (they mix in the rotated kv shard); mark the constant initial values
    # varying over the axis so the scan carry types line up
    def mark_varying(x):
        if hasattr(jax.lax, 'pcast'):
            return jax.lax.pcast(x, (axis_name,), to='varying')
        return jax.lax.pvary(x, (axis_name,))

    acc, m, l = (mark_varying(x) for x in (acc, m, l))

    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    def accumulate(k, v, acc, m, l):
        s = jnp.einsum('bqhd,bkhd->bhqk', query, k,
                       preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            'bhqk,bkhd->bhqd', p.astype(v.dtype), v,
            preferred_element_type=jnp.float32)
        return acc, m_new, l

    # local shard first, then rotate-and-accumulate N-1 times: exactly
    # N-1 ICI rotations, and every rotated shard is consumed (a rotate-last
    # body would pay one extra, discarded transfer per call)
    acc, m, l = accumulate(key, value, acc, m, l)

    def step(carry, _):
        k, v, acc, m, l = carry
        # XLA overlaps this ICI transfer with the einsums above it in the
        # previous iteration
        k = jax.lax.ppermute(k, axis_name, perm)
        v = jax.lax.ppermute(v, axis_name, perm)
        acc, m, l = accumulate(k, v, acc, m, l)
        return (k, v, acc, m, l), ()

    (key, value, acc, m, l), _ = jax.lax.scan(
        step, (key, value, acc, m, l), None, length=axis_size - 1)

    out = acc / l[..., None]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(query.dtype)


def ring_self_attention(x, *, axis_name: str, num_heads: int):
    """Self-attention on a sequence-sharded activation ``[B, L_local, C]``.

    Projection-free helper for composing ring attention inside shard_map
    when q/k/v have already been projected and packed as ``[B, L, H*D]``.
    """
    batch, l_local, ch = x.shape
    assert ch % num_heads == 0
    qkv = x.reshape(batch, l_local, num_heads, ch // num_heads)
    return ring_attention(qkv, qkv, qkv, axis_name=axis_name).reshape(
        batch, l_local, ch)


def sharded_ring_attention(mesh, query, key, value):
    """Ring attention on GLOBAL ``[B, L, H, D]`` arrays over a seq-axis mesh.

    The shard_map entry point for sequence parallelism: batch shards over
    ``data``, sequence over ``seq`` (``create_mesh(sequence_parallelism=N)``
    adds the axis), and each device holds ``L / N`` of the tokens while the
    ring rotation streams every k/v shard past every query shard. Usable
    directly inside a jitted train step — GSPMD repartitions the operands to
    the required layout.
    """
    from sav_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS

    if SEQ_AXIS not in mesh.axis_names:
        raise ValueError(
            f'mesh {dict(mesh.shape)} has no {SEQ_AXIS!r} axis; build it '
            f'with create_mesh(sequence_parallelism=N)')
    from jax.sharding import PartitionSpec as P

    spec = P(DATA_AXIS, SEQ_AXIS, None, None)
    fn = jax.shard_map(
        functools.partial(ring_attention, axis_name=SEQ_AXIS),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(query, key, value)


class RingSelfAttentionBlock(nn.Module):
    """Drop-in ``SelfAttentionBlock`` running the attention core
    ring-sharded over ``mesh``'s ``seq`` axis.

    Parameter tree (queries/keys/values/DenseGeneral_0) matches
    ``sav_tpu.nn.SelfAttentionBlock`` without talking-heads/dropout, so
    parameters trained with the single-device block load unchanged — only
    the execution strategy differs. Dropout-free: the sequence-parallel
    regime (L >> the zoo's 3136) pairs with models that regularize
    elsewhere; add attention dropout inside ``ring_attention`` if ever
    needed.
    """

    num_heads: int
    mesh: object                        # jax.sharding.Mesh (hashable)
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, is_training: bool = False):
        in_ch = inputs.shape[-1]
        assert in_ch % self.num_heads == 0
        head_ch = in_ch // self.num_heads
        projection = functools.partial(
            nn.DenseGeneral, axis=-1,
            features=(self.num_heads, head_ch),
            use_bias=self.use_bias, dtype=self.dtype)
        query = projection(name='queries')(inputs)
        key = projection(name='keys')(inputs)
        value = projection(name='values')(inputs)
        x = sharded_ring_attention(self.mesh, query, key, value)
        return nn.DenseGeneral(features=in_ch, axis=(-2, -1),
                               use_bias=self.use_bias,
                               dtype=self.dtype)(x)
