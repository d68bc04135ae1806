"""Device mesh and sharding-rule utilities.

The reference scaled only by data parallelism via ``jax.pmap`` +
``lax.pmean`` (reference: train.py:94-96,228-231). Here the same math is
expressed TPU-natively: one ``jax.sharding.Mesh`` with a ``data`` axis for
batch sharding over ICI and an optional ``model`` axis for Megatron-style
tensor parallelism of attention heads and MLP hidden units. XLA/GSPMD
inserts the all-reduces; there is no hand-written collective in the trainer.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'
SEQ_AXIS = 'seq'
PIPE_AXIS = 'pipe'


def create_mesh(devices=None, model_parallelism: int = 1,
                hybrid: bool = False,
                sequence_parallelism: int = 1,
                pipeline_parallelism: int = 1) -> Mesh:
    """Builds a ('data', 'model') mesh over the given (or all) devices.

    ``model_parallelism=1`` is pure data parallelism — the reference's only
    strategy. The model axis is placed innermost so tensor-parallel
    collectives ride the fastest ICI links.

    ``sequence_parallelism>1`` inserts a ``seq`` axis between data and
    model — the ring-attention axis (``parallel.ring_attention``): k/v
    shards rotate over neighboring devices, so it too wants ICI adjacency.
    The axis only exists when requested, keeping 2-axis meshes unchanged.

    ``pipeline_parallelism>1`` inserts a ``pipe`` axis (outside seq/model,
    inside data) — the GPipe stage axis (``parallel.pipeline``): encoder
    layers are split into stages and activations hop stage-to-stage over
    ``ppermute``, one neighbor per tick, so ICI adjacency matters here too.

    With ``hybrid=True`` on a multi-process (multi-slice) run, the data
    axis is laid out DCN-major via ``create_hybrid_device_mesh`` so the
    gradient all-reduce decomposes into intra-slice ICI reductions plus a
    small cross-slice DCN exchange.
    """
    if hybrid and devices is None and jax.process_count() > 1:
        from jax.experimental import mesh_utils
        per_slice = jax.local_device_count()
        if per_slice % model_parallelism:
            raise ValueError(
                f'{per_slice} local devices not divisible by '
                f'model_parallelism={model_parallelism}')
        try:
            grid = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(per_slice // model_parallelism,
                            model_parallelism),
                dcn_mesh_shape=(jax.process_count(), 1))
        except ValueError:
            # multi-process CPU clusters (and any backend without slice
            # attributes) report a single slice; a process-major device
            # order gives the same DCN-major data axis — intra-host
            # neighbors adjacent, cross-host hops outermost
            devs = sorted(jax.devices(),
                          key=lambda d: (d.process_index, d.id))
            grid = np.asarray(devs).reshape(
                len(devs) // model_parallelism, model_parallelism)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS))

    devices = np.asarray(devices if devices is not None else jax.devices())
    inner = model_parallelism * sequence_parallelism * pipeline_parallelism
    if devices.size % inner:
        raise ValueError(
            f'{devices.size} devices not divisible by model_parallelism='
            f'{model_parallelism} * sequence_parallelism='
            f'{sequence_parallelism} * pipeline_parallelism='
            f'{pipeline_parallelism}')
    # optional axes appear only when requested, keeping the common 2-axis
    # ('data', 'model') layout — and every existing sharding rule — unchanged
    axes = [(DATA_AXIS, devices.size // inner)]
    if pipeline_parallelism > 1:
        axes.append((PIPE_AXIS, pipeline_parallelism))
    if sequence_parallelism > 1:
        axes.append((SEQ_AXIS, sequence_parallelism))
    axes.append((MODEL_AXIS, model_parallelism))
    grid = devices.reshape(*(size for _, size in axes))
    return Mesh(grid, tuple(name for name, _ in axes))


_distributed_initialized = False


def maybe_initialize_distributed():
    """Joins the multi-host JAX cluster when coordinator env vars exist.

    The reference assumed an already-initialized pmap world and only gated
    on process_index (train.py:102,124,195); here the runtime joins the
    cluster itself. No-ops on single-host runs.

    Decides from the environment alone: any backend-touching query (e.g.
    ``jax.process_count()``) would initialize the XLA client first, after
    which ``jax.distributed.initialize()`` raises — so this must run, and
    must itself not query devices, before any other JAX API use.
    """
    global _distributed_initialized
    import os
    if _distributed_initialized:
        return
    if not (os.environ.get('JAX_COORDINATOR_ADDRESS')
            or os.environ.get('COORDINATOR_ADDRESS')):
        return
    # the launching script may have initialized the cluster itself (the
    # standard multi-host pattern); jax.distributed keeps a global client —
    # treat "already initialized" as success rather than crashing
    if getattr(jax.distributed, 'global_state', None) is not None and \
            jax.distributed.global_state.client is not None:
        _distributed_initialized = True
        return
    # JAX's cluster auto-detection covers TPU/Slurm/OMPI/k8s but has no
    # generic env-var path for process identity; a plain launcher (or the
    # 2-process CPU-cluster test) specifies membership explicitly via
    # JAX_NUM_PROCESSES / JAX_PROCESS_ID next to the coordinator address.
    kwargs = {}
    if os.environ.get('JAX_NUM_PROCESSES'):
        kwargs = dict(
            coordinator_address=(os.environ.get('JAX_COORDINATOR_ADDRESS')
                                 or os.environ.get('COORDINATOR_ADDRESS')),
            num_processes=int(os.environ['JAX_NUM_PROCESSES']),
            process_id=int(os.environ['JAX_PROCESS_ID']),
        )
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as exc:
        if 'already' not in str(exc).lower():
            raise
    _distributed_initialized = True


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shards the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Megatron-style tensor-parallel rules for transformer params, matched
# against flax param key paths. Attention q/k/v kernels are (in, heads, dim)
# -> shard heads; the merged output kernel is (heads, dim, out) -> shard
# heads; MLP hidden units shard on the hidden axis (column- then
# row-parallel). Everything else is replicated.
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r"\['(queries|keys|values)'\]\['kernel'\]", P(None, MODEL_AXIS, None)),
    (r"\['(queries|keys|values)'\]\['bias'\]", P(MODEL_AXIS, None)),
    (r"\['(Self|Class|LCSelf|CvT)?Attention[^ ]*'\]\['DenseGeneral_0'\]"
     r"\['kernel'\]", P(MODEL_AXIS, None, None)),
    (r"\['FFBlock_\d+'\]\['Dense_0'\]\['kernel'\]", P(None, MODEL_AXIS)),
    (r"\['FFBlock_\d+'\]\['Dense_0'\]\['bias'\]", P(MODEL_AXIS)),
    (r"\['FFBlock_\d+'\]\['Dense_1'\]\['kernel'\]", P(MODEL_AXIS, None)),
)


def param_spec(path: str, ndim: Optional[int] = None) -> P:
    """PartitionSpec for one param, keyed by its flax key path string.

    With ``ndim`` given, scan-stacked parameters (one extra leading layer
    axis from ``scan_layers=True``) get their spec shifted right so the
    intended axis is still the one sharded.
    """
    for pattern, spec in _TP_RULES:
        if re.search(pattern, path):
            if ndim is not None and ndim == len(spec) + 1:
                return P(None, *spec)
            return spec
    return P()


def param_shardings(mesh: Mesh, params) -> object:
    """Pytree of NamedShardings for a param/variable tree.

    With ``model`` axis size 1 every spec degenerates to fully replicated,
    i.e. plain data parallelism.
    """
    if mesh.shape[MODEL_AXIS] == 1:
        return jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), params)

    def one(path, leaf):
        spec = param_spec(jax.tree_util.keystr(path),
                          ndim=getattr(leaf, 'ndim', None))
        # Guard: only apply a spec if the axis size divides the dim.
        sizes = dict(mesh.shape)
        for dim, axis in enumerate(spec):
            if axis is not None and (dim >= leaf.ndim
                                     or leaf.shape[dim] % sizes[axis]):
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)
