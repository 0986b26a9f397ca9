"""Fused BatchNorm + activation + K-tap conv1d Pallas kernel.

The Enformer value net's conv tower spends its decode budget on
"NACDR" ConvBlocks (norm -> act -> k=5 conv; Enformer.py:2176-2292).
Under plain XLA our matmul-formulated conv (ops/conv1d.py) is MXU-
optimal for the dot itself (~98% MFU measured) but forces two extra
HBM round trips per block at the flagship decode shape
(B*M=2560, L<=100, C 768-1536):

  1. the BN+gelu elementwise pass materializes its output
     (matmul operands cannot fuse producers in XLA), and
  2. the im2col concat materializes a K*Cin-wide buffer
     (~1.2 ms/step per conv in pad_dynamic-update-slice fusions).

This kernel reads x ONCE per (TILE_N, L, Cin) block, applies the
eval-mode BN affine + activation on the VPU in VMEM, forms the K tap
shifts as in-VMEM slices of a zero-padded copy, and accumulates the K
dot_generals into an fp32 scratch before one bf16 output write:
HBM traffic = x + W + out, the floor.

Grid: (n_tiles,) with the FULL (K, Cin, Cout) weight resident in VMEM
(constant index map -> fetched once; <=20 MB for the tower's largest
conv). TILE_N adapts to L so each dot sees ~2k rows.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _act(name: str | None, x: Array) -> Array:
  if name is None:
    return x
  if name == 'gelu_enformer':
    return x * jax.nn.sigmoid(1.702 * x)
  if name == 'relu':
    return jnp.maximum(x, 0)
  if name == 'gelu':
    return jax.nn.gelu(x, approximate=False)
  raise NotImplementedError(name)


def fused_conv1d_reference(x: Array, kernel: Array, bias: Array,
                           scale: Array, shift: Array,
                           act: str | None = 'gelu_enformer') -> Array:
  """Pure-jnp reference: conv1d(act(x*scale+shift)) + bias."""
  from svdd_tpu.ops.conv1d import conv1d_shifted
  xg = _act(act, x.astype(jnp.float32) * scale + shift).astype(x.dtype)
  return conv1d_shifted(xg, kernel, bias)


def _kernel(x_ref, w_ref, b_ref, s_ref, t_ref, o_ref, *, k_taps: int,
            act: str | None, out_dtype):
  half = (k_taps - 1) // 2
  xg = x_ref[:].astype(jnp.float32)
  xg = xg * s_ref[0][None, None, :] + t_ref[0][None, None, :]
  xg = _act(act, xg).astype(x_ref.dtype)
  tn, l, c_in = xg.shape
  # NB an in-VMEM im2col (lane-concat of the K sublane-shifted slices
  # + one deep-K dot) crashes Mosaic: tpu.concatenate rejects operands
  # with mismatched sublane offsets. Tap-accumulate instead.
  xp = jnp.pad(xg, ((0, 0), (half, half), (0, 0)))
  acc = None
  dn = (((2,), (0,)), ((), ()))
  for k in range(k_taps):
    tap = jax.lax.dot_general(xp[:, k:k + l, :], w_ref[k], dn,
                              preferred_element_type=jnp.float32)
    acc = tap if acc is None else acc + tap
  acc = acc + b_ref[0].astype(jnp.float32)[None, None, :]
  o_ref[:] = acc.astype(out_dtype)


def _pick_tile_n(n: int, l: int, c_in: int, c_out: int,
                 k_taps: int, budget: int = 72 * 2 ** 20) -> int:
  """Largest divisor-of-N tile with ~2k dot rows that fits the VMEM
  budget (x/out double-buffered, W resident, cols + fp32 acc live)."""
  target = max(8, 2048 // max(l, 1))
  best = 0
  for cand in (8, 16, 32, 64, 128, 256, 512):
    if cand > target or n % cand:
      continue
    rows = cand * l
    est = (2 * rows * c_in * 2 + 2 * k_taps * c_in * c_out * 2
           + rows * k_taps * c_in * 2 + rows * c_out * 4
           + 2 * rows * c_out * 2)
    if est <= budget:
      best = cand
  return best


def use_pallas_fused_conv() -> bool:
  """Default OFF (opt in with SVDD_PALLAS_FUSED_CONV=1).

  Measured on v5e at the flagship decode shape (2560,100,768->768,k=5):
  XLA's im2col matmul runs at ~194 TFLOP/s (98% MFU) while Mosaic's
  dot codegen plateaus at ~115-122 TFLOP/s for every formulation tried
  (3D dot_general, flat 2D taps, TILE_N 8..64; in-VMEM lane-concat
  im2col crashes tpu.concatenate on mismatched sublane offsets). The
  ~6 ms/step of HBM traffic this kernel saves (separate BN/gelu pass +
  im2col materialization) is smaller than the ~8 ms it loses on MXU
  efficiency, so the XLA path stays the default."""
  return os.environ.get('SVDD_PALLAS_FUSED_CONV') == '1'


@functools.partial(jax.jit, static_argnames=('act', 'interpret'))
def fused_conv1d_pallas(x: Array, kernel: Array, bias: Array,
                        scale: Array, shift: Array,
                        act: str | None = 'gelu_enformer',
                        interpret: bool = False) -> Array:
  """conv1d(act(x*scale+shift), kernel) + bias via one Pallas kernel.

  x (N, L, Cin); kernel (K, Cin, Cout); scale/shift (Cin,) — the
  eval-mode BN collapsed to an affine. SAME padding, dilation 1.
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  n, l, c_in = x.shape
  k_taps, _, c_out = kernel.shape
  tile_n = _pick_tile_n(n, l, c_in, c_out, k_taps)
  grid = (n // tile_n,)

  out_shape = jax.ShapeDtypeStruct((n, l, c_out), x.dtype)
  body = functools.partial(_kernel, k_taps=k_taps, act=act,
                           out_dtype=x.dtype)
  return pl.pallas_call(
      body,
      grid=grid,
      in_specs=[
          pl.BlockSpec((tile_n, l, c_in), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((k_taps, c_in, c_out), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c_out), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c_in), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c_in), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((tile_n, l, c_out), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=out_shape,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      cost_estimate=pl.CostEstimate(
          flops=2 * n * l * k_taps * c_in * c_out,
          bytes_accessed=(x.size + kernel.size + out_shape.size) * 2,
          transcendentals=n * l * c_in),
      interpret=interpret,
  )(x, kernel, bias.reshape(1, c_out),
    scale.astype(jnp.float32).reshape(1, c_in),
    shift.astype(jnp.float32).reshape(1, c_in))


def fused_conv1d(x: Array, kernel: Array, bias: Array, scale: Array,
                 shift: Array, act: str | None = 'gelu_enformer',
                 use_pallas: bool | None = None) -> Array:
  """Dispatcher: Pallas on TPU, jnp reference elsewhere. Falls back
  when shapes don't tile (N not divisible by 8 or K even)."""
  n, l, c_in = x.shape
  k_taps = kernel.shape[0]
  ok = (n % 8 == 0 and k_taps % 2 == 1 and c_in % 128 == 0
        and kernel.shape[2] % 128 == 0
        and _pick_tile_n(n, l, c_in, kernel.shape[2], k_taps) > 0)
  if use_pallas is None:
    use_pallas = use_pallas_fused_conv()
  if use_pallas and ok:
    return fused_conv1d_pallas(x, kernel, bias, scale, shift, act=act)
  return fused_conv1d_reference(x, kernel, bias, scale, shift, act=act)
