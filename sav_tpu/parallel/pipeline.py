"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference never scaled past data parallelism (reference:
train.py:94-96 — pmap + pmean was its whole strategy); this module adds
the remaining classic axis TPU-natively.  The scan-stacked encoder layout
(``scan_layers=True`` — parameters carry a leading layer axis) is already
the pipeline-ready layout: the layer axis is sharded over the ``pipe``
mesh axis so each device holds ``num_layers / S`` contiguous layers (one
*stage*), the batch is split into ``M`` microbatches, and activations hop
stage-to-stage over ``lax.ppermute`` — one ICI neighbor per tick, no
hand-written NCCL/MPI, and the backward schedule falls out of autodiff
(ppermute's transpose is the reverse hop).

Schedule: the textbook GPipe fill-drain loop, ``T = M + S - 1`` ticks; at
tick ``t`` stage ``s`` processes microbatch ``t - s`` (masked outside
``0 <= t - s < M``).  Bubble fraction is ``(S-1)/T`` — amortized away by
raising ``num_microbatches``.  All stages run every tick (the masked
ticks compute on pass-through values whose outputs never reach the loss,
so their gradient contribution is exactly zero).

Everything is a pure function under ``jax.jit`` + ``shard_map``: GSPMD
keeps handling the data axis (microbatches stay batch-sharded inside the
pipeline body), while the ``pipe`` axis is manual — exactly the split the
scaling playbook prescribes (collectives ride ICI; the compiler fuses
per-stage compute).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
try:                                    # jax >= 0.8
    from jax import shard_map
except ImportError:                     # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from sav_tpu.parallel.mesh import DATA_AXIS, PIPE_AXIS


def pipeline_apply(block_fn: Callable, stacked_params, x, *, mesh,
                   num_microbatches: int):
    """Runs ``num_layers`` blocks over ``pipe`` stages, GPipe-scheduled.

    Args:
      block_fn: ``(layer_params, h) -> h`` applying ONE block; must be
        deterministic (no dropout RNG — the trainer asserts this).
      stacked_params: pytree whose leaves carry a leading ``num_layers``
        axis (the ``scan_layers=True`` layout), sharded ``P('pipe', ...)``.
      x: ``[B, L, D]`` activations, batch-sharded over ``data``.
      mesh: a mesh with a ``pipe`` axis (``create_mesh(pipeline_parallelism=S)``).
      num_microbatches: ``M``; ``B % M == 0``.  Bubble = ``(S-1)/(M+S-1)``.

    Returns ``[B, L, D]`` outputs, batch-sharded over ``data`` and
    replicated over ``pipe``.
    """
    if PIPE_AXIS not in mesh.shape:
        raise ValueError('mesh has no pipe axis; build it with '
                         'create_mesh(pipeline_parallelism=S)')
    num_stages = mesh.shape[PIPE_AXIS]
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if num_layers % num_stages:
        raise ValueError(f'{num_layers} layers not divisible by '
                         f'{num_stages} pipeline stages')
    batch = x.shape[0]
    if batch % num_microbatches:
        raise ValueError(f'batch {batch} not divisible by '
                         f'num_microbatches={num_microbatches}')

    x_mb = x.reshape(num_microbatches, batch // num_microbatches, *x.shape[1:])

    body = functools.partial(_pipeline_body, block_fn=block_fn,
                             num_stages=num_stages,
                             num_microbatches=num_microbatches)
    param_spec = jax.tree_util.tree_map(lambda _: P(PIPE_AXIS),
                                        stacked_params)
    mb_spec = P(None, DATA_AXIS)
    out = shard_map(body, mesh=mesh,
                    in_specs=(param_spec, mb_spec),
                    out_specs=mb_spec)(stacked_params, x_mb)
    return out.reshape(batch, *x.shape[1:])


def _pipeline_body(stage_params, x_mb, *, block_fn, num_stages,
                   num_microbatches):
    """Per-device GPipe loop (inside shard_map; ``pipe`` axis is manual)."""
    stage = lax.axis_index(PIPE_AXIS)
    ring = [(i, (i + 1) % num_stages) for i in range(num_stages)]

    def vary(v):
        # newer JAX tracks varying-manual-axes types: values derived from
        # ppermute/axis_index vary over 'pipe', so the scan carry (and the
        # unvarying fresh microbatches mixed into it) must be marked too
        return lax.pvary(v, (PIPE_AXIS,)) if hasattr(lax, 'pvary') else v

    state = vary(jnp.zeros_like(x_mb[0]))
    outputs = vary(jnp.zeros_like(x_mb))

    def run_stage(h):
        def one_layer(carry, layer_params):
            return block_fn(layer_params, carry), None
        out, _ = lax.scan(one_layer, h, stage_params)
        return out

    def tick(carry, t):
        state, outputs = carry
        # stage 0 consumes fresh microbatch t; later stages consume what
        # stage s-1 sent last tick (= microbatch t - s, by induction)
        fresh = vary(lax.dynamic_index_in_dim(
            x_mb, jnp.minimum(t, num_microbatches - 1), keepdims=False))
        x_in = jnp.where(stage == 0, fresh, state)
        y = run_stage(x_in)
        valid = jnp.logical_and(t >= stage, t - stage < num_microbatches)
        y = jnp.where(valid, y, x_in)
        # the last stage owns output microbatch t - (S-1)
        out_t = jnp.clip(t - (num_stages - 1), 0, num_microbatches - 1)
        write = jnp.logical_and(stage == num_stages - 1,
                                t >= num_stages - 1)
        row = jnp.where(
            write, y,
            lax.dynamic_index_in_dim(outputs, out_t, keepdims=False))
        outputs = lax.dynamic_update_index_in_dim(outputs, row, out_t, 0)
        state = lax.ppermute(y, PIPE_AXIS, ring)
        return (state, outputs), None

    (_, outputs), _ = lax.scan(
        tick, (state, outputs),
        jnp.arange(num_microbatches + num_stages - 1))
    # replicate the last stage's buffer across the pipe axis so the head
    # and loss run identically everywhere (masked psum: one all-reduce)
    return lax.psum(
        jnp.where(stage == num_stages - 1, outputs,
                  jnp.zeros_like(outputs)), PIPE_AXIS)


def vit_pipeline_forward(model, params, images, *, mesh,
                         num_microbatches: int, is_training: bool = False):
    """ViT forward with the encoder stack pipeline-parallel.

    Mathematically identical to ``model.apply`` (same param tree, logits
    equal to the single-device forward — tested); only the schedule
    differs: patch embed / cls / pos-embed and the final LN + head run
    data-parallel under GSPMD, the encoder blocks run GPipe-scheduled over
    the ``pipe`` axis.  Requires ``scan_layers=True`` (the stacked layout
    IS the stage shard) and zero dropout (no RNG is threaded through the
    pipeline body; the zoo's headline configs are dropout-free).
    """
    from sav_tpu.models.vit import EncoderBlock
    from sav_tpu.nn import (AddAbsPosEmbed, FixedPositionalEmbedding,
                            PatchEmbedBlock)

    if not model.scan_layers:
        raise ValueError('pipeline parallelism needs scan_layers=True '
                         '(the stacked layer axis is the stage shard)')
    if model.dropout_rate or model.attn_dropout_rate:
        raise ValueError('pipeline path is dropout-free')

    x = PatchEmbedBlock(
        patch_shape=model.patch_shape, embed_dim=model.embed_dim,
        dtype=model.dtype).apply(
            {'params': params['PatchEmbedBlock_0']},
            images.astype(model.dtype))
    cls = jnp.tile(params['cls'].astype(model.dtype), [x.shape[0], 1, 1])
    x = jnp.concatenate([cls, x], axis=1)

    enc = params['Encoder_0']
    if model.pos_embed == 'learned':
        x = AddAbsPosEmbed().apply(
            {'params': enc['AddAbsPosEmbed_0']}, x)
    elif model.pos_embed == 'fixed':
        x = FixedPositionalEmbedding(dtype=model.dtype).apply({}, x)
    elif model.pos_embed not in ('rotary', 'none'):
        raise ValueError(f'unknown pos_embed {model.pos_embed!r}')

    block = EncoderBlock(num_heads=model.num_heads,
                         expand_ratio=model.expand_ratio,
                         activation_fn=model.activation_fn,
                         dtype=model.dtype,
                         use_kernel=model.use_kernel,
                         fused_qkv=model.fused_qkv,
                         quantized=model.quantized,
                         rotary=model.pos_embed == 'rotary')

    def block_fn(layer_params, h):
        return block.apply({'params': layer_params}, h,
                           is_training=is_training)

    x = pipeline_apply(block_fn, enc['EncoderBlock'],
                       x.astype(model.dtype), mesh=mesh,
                       num_microbatches=num_microbatches)

    import flax.linen as nn
    x = nn.LayerNorm(dtype=model.dtype).apply(
        {'params': enc['LayerNorm_0']}, x)
    return nn.Dense(features=model.num_classes, dtype=model.dtype).apply(
        {'params': params['Dense_0']}, x[:, 0])
