"""Mesh and tensor-parallel sharding rules."""

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from sav_tpu.parallel import mesh as mesh_lib


def test_create_mesh_shapes():
    mesh = mesh_lib.create_mesh()
    assert mesh.shape['data'] == len(jax.devices())
    assert mesh.shape['model'] == 1

    mesh = mesh_lib.create_mesh(model_parallelism=2)
    assert mesh.shape['data'] * 2 == len(jax.devices())


def test_param_spec_rules():
    qkv = "['Encoder_0']['EncoderBlock_3']['SelfAttentionBlock_0']" \
          "['queries']['kernel']"
    assert mesh_lib.param_spec(qkv) == P(None, 'model', None)

    out = "['Encoder_0']['EncoderBlock_3']['SelfAttentionBlock_0']" \
          "['DenseGeneral_0']['kernel']"
    assert mesh_lib.param_spec(out) == P('model', None, None)

    ff0 = "['Encoder_0']['EncoderBlock_3']['FFBlock_0']['Dense_0']['kernel']"
    assert mesh_lib.param_spec(ff0) == P(None, 'model')
    ff1 = "['Encoder_0']['EncoderBlock_3']['FFBlock_0']['Dense_1']['kernel']"
    assert mesh_lib.param_spec(ff1) == P('model', None)

    # everything else replicates
    assert mesh_lib.param_spec("['Encoder_0']['LayerNorm_0']['scale']") == P()
    assert mesh_lib.param_spec("['cls']") == P()


def test_param_shardings_respects_divisibility():
    mesh = mesh_lib.create_mesh(model_parallelism=2)
    params = {
        'queries': {'kernel': np.zeros((32, 4, 8))},   # 4 heads % 2 == 0
        'odd': {'queries': {'kernel': np.zeros((32, 3, 8))}},  # 3 heads
    }
    shardings = mesh_lib.param_shardings(mesh, params)
    assert shardings['queries']['kernel'].spec == P(None, 'model', None)
    assert shardings['odd']['queries']['kernel'].spec == P()


def test_maybe_initialize_distributed_env_only(monkeypatch):
    """Must decide from env vars alone and call jax.distributed.initialize
    BEFORE any backend-touching query (jax.process_count() would initialize
    the XLA client, after which initialize() raises — advisor finding r1)."""
    import jax
    from sav_tpu.parallel import mesh as mesh_lib

    calls = []
    monkeypatch.setattr(jax.distributed, 'initialize',
                        lambda *a, **k: calls.append('init'))

    def forbidden(*a, **k):
        raise AssertionError('backend queried before distributed.initialize')

    monkeypatch.setattr(jax, 'process_count', forbidden)
    monkeypatch.setattr(jax, 'devices', forbidden)

    monkeypatch.setattr(mesh_lib, '_distributed_initialized', False)
    monkeypatch.delenv('JAX_COORDINATOR_ADDRESS', raising=False)
    monkeypatch.delenv('COORDINATOR_ADDRESS', raising=False)
    mesh_lib.maybe_initialize_distributed()
    assert calls == []          # no coordinator configured -> no-op

    monkeypatch.setenv('JAX_COORDINATOR_ADDRESS', 'localhost:1234')
    mesh_lib.maybe_initialize_distributed()
    assert calls == ['init']
    mesh_lib.maybe_initialize_distributed()   # idempotent
    assert calls == ['init']
