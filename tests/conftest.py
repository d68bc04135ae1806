"""Test environment: force a genuine 8-device CPU mesh.

This is the JAX-native fake-multichip idiom: sharding/collective code paths
are exercised on 8 virtual CPU devices, matching how the driver dry-runs the
multi-chip path.

The image ships a sitecustomize that registers a tunneled TPU backend and
imports jax before any test code runs, so plain JAX_PLATFORMS=cpu in the
environment is too late — we update the live config instead. XLA_FLAGS is
still read when the CPU client is first created, so setting it here works.
"""

import os
import sys

_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (
        _flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert len(jax.devices()) >= 8, jax.devices()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


# ---------------------------------------------------------------- tiers
#
# The full suite is ~50 min serial on this 1-core host; the quick tier
# (`-m "not heavy"`) keeps every unit/parity/kernel test and defers the
# end-to-end loops. Membership is by measured wall share (suite
# --durations run, docs/ROADMAP.md r4): each listed file costs >2 min.
HEAVY_FILES = {
    'test_train.py',        # full Trainer loops on the 8-dev mesh
    'test_multihost.py',    # real 2-process gRPC cluster
    'test_preemption.py',   # subprocess SIGTERM/resume cycles
    'test_pipeline.py',     # jit-fused augmentation graphs end to end
    'test_evaluate.py',     # checkpoint -> full-split eval walks
    'test_finetune.py',     # train->save->adapt->retrain cycles
    'test_golden_parity.py',  # imports + runs the reference models
    'test_hf_import.py',    # transformers torch model forward
    'test_timm_import.py',  # torch-native twin forward
    'test_scan_layers.py',  # deep scanned-model compiles
    'test_tnt_inner.py',    # whole-TNT interpret-mode kernel routes
    'test_int8_ff.py',      # model-level quantized trees + train steps
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if os.path.basename(str(item.fspath)) in HEAVY_FILES:
            item.add_marker(pytest.mark.heavy)
