"""Fused NACDR-prologue + im2col producer for the value-tower convs.

The Enformer tower's k=5 NACDR ConvBlocks (norm -> act -> conv,
reference Enformer.py:2176-2292 with order "NACDR") lower under XLA to
eval-BN affine + gelu materialization followed by a pad/dynamic-update
-slice chain that builds the (N, L, K*C) im2col buffer — ~20 ms/step of
pure bandwidth at the B=512 guided-decode shape (trace r2-b512), plus
~5 ms of separate norm/act passes.

This kernel reads the raw block input ONCE, applies the affine+act on
the VPU, and writes the K_live tap slabs of the im2col buffer directly
(separate lane-offset stores — an in-VMEM concatenate of shifted
slices crashes Mosaic on mismatched sublane offsets, see
ops/fused_conv_pallas.py). The conv itself stays ONE XLA matmul against
the tap-stacked weight at the measured ~190 TFLOP/s — Pallas dots
plateau at 115-122 TFLOP/s here (TODO.md), so fusing the dot would
lose; fusing everything BETWEEN the matmuls is the winning split.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jnp.ndarray


from svdd_tpu.ops.kernel_utils import (act as _act, default_on_tpu,
                                       live_offsets)


def _live_offsets(k_taps: int, length: int) -> list[int]:
  return live_offsets(k_taps, length)


def nacdr_im2col_reference(x: Array, scale: Array, shift: Array,
                           k_taps: int, act: str | None) -> Array:
  """jnp reference: act(x*scale+shift) -> stacked shifted copies."""
  xg = _act(act, x.astype(jnp.float32) * scale + shift).astype(x.dtype)
  n, l, c = x.shape
  slabs = []
  for off in _live_offsets(k_taps, l):
    if off >= 0:
      seg = jnp.pad(xg[:, off:, :], ((0, 0), (0, off), (0, 0)))
    else:
      seg = jnp.pad(xg[:, :l + off, :], ((0, 0), (-off, 0), (0, 0)))
    slabs.append(seg)
  return jnp.concatenate(slabs, axis=-1)


def _kernel(x_ref, s_ref, t_ref, o_ref, *, offsets, act):
  x = x_ref[:]
  tn, l, c = x.shape
  xg = x.astype(jnp.float32) * s_ref[0][None, None, :] \
      + t_ref[0][None, None, :]
  xg = _act(act, xg).astype(x.dtype)
  for j, off in enumerate(offsets):
    if off >= 0:
      seg = jnp.pad(xg[:, off:, :], ((0, 0), (0, off), (0, 0)))
    else:
      seg = jnp.pad(xg[:, :l + off, :], ((0, 0), (-off, 0), (0, 0)))
    o_ref[:, :, j * c:(j + 1) * c] = seg


def _pick_tile_n(n: int, l: int, c: int, k_live: int,
                 budget: int = 56 * 2 ** 20) -> int:
  """Mosaic stack accounting charges the pad temps per tap on top of
  the double-buffered in/out blocks — a 96M budget OOM'd at
  (5120,25,896,k5); 56M keeps the largest tiles comfortably under the
  110M scoped-vmem limit."""
  best = 0
  for cand in (1, 2, 4, 8, 16, 32, 64, 128):
    if n % cand:
      continue
    rows = cand * l * c
    est = (2 * rows * 2              # x double-buffered bf16
           + rows * 4 * 2            # f32 prologue temps
           + rows * 2                # per-tap pad temp
           + 2 * rows * k_live * 2)  # cols out double-buffered
    if est <= budget:
      best = cand
  return best


@functools.partial(jax.jit, static_argnames=('k_taps', 'act',
                                             'interpret'))
def nacdr_im2col_pallas(x: Array, scale: Array, shift: Array,
                        k_taps: int, act: str | None,
                        interpret: bool = False) -> Array:
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  n, l, c = x.shape
  offsets = tuple(_live_offsets(k_taps, l))
  k_live = len(offsets)
  tile_n = _pick_tile_n(n, l, c, k_live)
  body = functools.partial(_kernel, offsets=offsets, act=act)
  return pl.pallas_call(
      body,
      grid=(n // tile_n,),
      in_specs=[
          pl.BlockSpec((tile_n, l, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((tile_n, l, k_live * c),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, l, k_live * c), x.dtype),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      cost_estimate=pl.CostEstimate(
          flops=4 * n * l * c,
          bytes_accessed=x.size * 2 * (1 + k_live),
          transcendentals=n * l * c),
      interpret=interpret,
  )(x, scale.reshape(1, c).astype(jnp.float32),
    shift.reshape(1, c).astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_core(x, scale, shift, k_taps, act, interpret):
  return nacdr_im2col_pallas(x, scale, shift, k_taps, act,
                             interpret=interpret)


def _fused_fwd(x, scale, shift, k_taps, act, interpret):
  out = nacdr_im2col_pallas(x, scale, shift, k_taps, act,
                            interpret=interpret)
  return out, (x, scale, shift)


def _fused_bwd(k_taps, act, interpret, res, ct):
  # DPS/classifier guidance differentiate the eval-mode value net
  _, vjp = jax.vjp(
      lambda x, s, t: nacdr_im2col_reference(x, s, t, k_taps, act),
      *res)
  return vjp(ct)


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def use_pallas_im2col() -> bool:
  """Default ON for TPU (opt out with SVDD_PALLAS_IM2COL=0)."""
  return default_on_tpu('SVDD_PALLAS_IM2COL')


def nacdr_conv1d(x: Array, kernel: Array, bias: Array, scale: Array,
                 shift: Array, act: str | None,
                 use_pallas: bool | None = None) -> Array:
  """conv1d(act(x*scale + shift)) + bias with the im2col buffer built
  by the fused kernel and the dot left to XLA. SAME padding,
  dilation 1. Falls back to the fused_conv_pallas reference path when
  the shape doesn't tile or off-TPU."""
  n, l, c_in = x.shape
  k_taps, _, c_out = kernel.shape
  if use_pallas is None:
    use_pallas = use_pallas_im2col()
  ok = (c_in % 128 == 0
        and _pick_tile_n(n, l, c_in, len(_live_offsets(k_taps, l))) > 0)
  if not (use_pallas and ok):
    from svdd_tpu.ops.fused_conv_pallas import fused_conv1d_reference
    return fused_conv1d_reference(x, kernel.astype(x.dtype),
                                  bias.astype(x.dtype), scale, shift,
                                  act=act)
  cols = _fused_core(x, scale, shift, k_taps, act, False)
  live = [o + (k_taps - 1) // 2 for o in _live_offsets(k_taps, l)]
  w = jnp.concatenate([kernel[k] for k in live], axis=0)
  out = jnp.dot(cols, w.astype(x.dtype),
                preferred_element_type=jnp.float32).astype(x.dtype)
  return out + bias.astype(x.dtype)
