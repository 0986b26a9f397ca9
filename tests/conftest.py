"""Test harness: force an 8-device virtual CPU mesh.

The reference never tests multi-device (SURVEY.md §4); we exercise every
sharded path on a virtual CPU mesh via
``--xla_force_host_platform_device_count=8``. Must be set before jax
initializes, hence the env mutation at import time.
"""

import os
import sys

# HARD override: the ambient environment sets JAX_PLATFORMS=axon (the
# remote TPU tunnel) — running 90 tests through the remote compiler
# takes hours and monopolizes the single chip. Tests always run on the
# virtual CPU mesh.
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# env vars alone are NOT enough here: sitecustomize imports jax and
# registers the axon TPU plugin at interpreter startup, which pins the
# platform before this file runs. The config update still works because
# backends initialize lazily on first computation.
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')

import pytest  # noqa: E402


@pytest.fixture
def rng():
  return jax.random.key(0)
