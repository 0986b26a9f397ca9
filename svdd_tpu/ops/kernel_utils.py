"""Shared helpers for the Pallas kernel family.

The NACDR activation registry and the live-tap rule define a
producer/consumer CONTRACT between the im2col-emitting kernels
(ops/attn_pool_pallas.pool_prologue_im2col, ops/im2col_pallas) and the
stacked-weight matmul in ops/conv1d.Conv1D(precols=...): both sides
must agree on which taps exist and how the prologue activates. Keep
them in exactly one place.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def act(name, x):
  """NACDR prologue activations (subset of models/blocks.activation
  that the fused eval path supports)."""
  if name is None:
    return x
  if name == 'gelu_enformer':
    return x * jax.nn.sigmoid(1.702 * x)
  if name == 'relu':
    return jnp.maximum(x, 0.0)
  if name == 'gelu':
    return jax.nn.gelu(x, approximate=False)
  raise NotImplementedError(name)


def live_offsets(k_taps: int, length: int, dilation: int = 1
                 ) -> list[int]:
  """Static tap offsets with |off| < length (the dead-tap rule of
  ops/conv1d.conv1d_shifted)."""
  half = (k_taps - 1) // 2 * dilation
  return [k * dilation - half for k in range(k_taps)
          if -length < k * dilation - half < length]


def default_on_tpu(env_name: str) -> bool:
  """Kill-switch convention for the Pallas kernels: default ON when
  running on TPU, opt out with <env_name>=0 (or force with =1)."""
  env = os.environ.get(env_name)
  if env is not None:
    return env == '1'
  try:
    return jax.default_backend() == 'tpu'
  except Exception:                                  # noqa: BLE001
    return False
