"""Fused residual-add + RMSNorm.

Replaces the Triton rms_norm_fn/layer_norm_fn the reference imports for
its DiMamba blocks (/root/reference/models/dimamba.py:27-37, 446-459).
On TPU a Pallas kernel fuses the residual add, the reduction, and the
scale into one VMEM pass; the jnp fallback compiles to the same fusion
via XLA on CPU (and is what tests exercise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _rmsnorm_ref(x: Array, residual: Array | None, scale: Array,
                 eps: float = 1e-5) -> Array:
  if residual is not None:
    x = x + residual
  var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                 keepdims=True)
  y = x * jax.lax.rsqrt(var + eps).astype(x.dtype)
  return y * scale


def _is_tpu() -> bool:
  try:
    return jax.devices()[0].platform in ('tpu', 'axon')
  except Exception:
    return False


def _rmsnorm_pallas(x: Array, residual: Array | None, scale: Array,
                    eps: float = 1e-5) -> Array:
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  orig_shape = x.shape
  d = x.shape[-1]
  x2 = x.reshape(-1, d)
  res2 = residual.reshape(-1, d) if residual is not None else None
  rows = x2.shape[0]
  block_rows = min(rows, max(8, 4096 // max(d // 128, 1)))
  # fall back when shapes don't tile cleanly
  if rows % block_rows or d % 128:
    return _rmsnorm_ref(x, residual, scale, eps)

  def kernel(*refs):
    if res2 is not None:
      x_ref, r_ref, s_ref, o_ref = refs
      v = x_ref[:] + r_ref[:]
    else:
      x_ref, s_ref, o_ref = refs
      v = x_ref[:]
    var = jnp.mean(jnp.square(v.astype(jnp.float32)), axis=-1,
                   keepdims=True)
    o_ref[:] = (v * jax.lax.rsqrt(var + eps).astype(v.dtype)
                * s_ref[:])

  in_specs = [pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)]
  args = [x2]
  if res2 is not None:
    in_specs.append(pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM))
    args.append(res2)
  in_specs.append(pl.BlockSpec((d,), lambda i: (0,),
                               memory_space=pltpu.VMEM))
  args.append(scale)

  out = pl.pallas_call(
      kernel,
      grid=(rows // block_rows,),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((block_rows, d), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
  )(*args)
  return out.reshape(orig_shape)


def fused_add_rmsnorm(x: Array, residual: Array | None, scale: Array,
                      eps: float = 1e-5) -> Array:
  """y = rmsnorm(x + residual) * scale (Triton-fused in the reference)."""
  if _is_tpu():
    try:
      return _rmsnorm_pallas(x, residual, scale, eps)
    except Exception:
      pass
  return _rmsnorm_ref(x, residual, scale, eps)
