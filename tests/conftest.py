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
