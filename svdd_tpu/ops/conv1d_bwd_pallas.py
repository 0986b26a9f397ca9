"""Fused Pallas backward for the shifted-matmul conv1d.

``ops/conv1d.conv1d_shifted`` computes a SAME-padded conv as ONE
im2col-concat matmul (taps stacked along channels). XLA differentiates
that formulation into (a) a (N, L, K*Cin) im2col COTANGENT buffer in
HBM plus the transpose-of-concatenate pad/slice/add chains that
scatter it back into dx, and (b) a wgrad dot that re-reads the full
materialized cols buffer. At the Enformer value-trunk shapes
(N=544, L=100, C=768..1536, k=5) those chains measure 650-750 GB/s
bandwidth-bound — the dominant bucket of the value-net grad step
(TODO.md value-net roofline; same pathology the fused CNN-layer
backward kernel removed from the diffusion pretrain step,
ops/cnn_layer_pallas.cnn_layer_bwd_pallas).

This kernel reads x and the cotangent ONCE per (TILE_N, L) block and
computes, entirely in VMEM:

  dgrad:  z = ct @ [W_k^T stacked]  (one MXU dot), then
          dx = sum_k shift(z_k, -off_k)   (static pads/slices),
  wgrad:  dW_k = x^T @ shift(ct, -off_k)  (per-tap transposed dots),
          accumulated across the sequential grid into a pinned block.

HBM traffic = x + ct + dx + dW — the floor. The conv is LINEAR, so no
forward recompute is needed (unlike the CNN-layer kernel, which must
rebuild its relu mask): the saved residuals are just (x, kernel).

The conv FORWARD stays the XLA stacked matmul (Mosaic dots plateau at
115-122 TF/s vs XLA's 187-194 on these FLOP-bound shapes — TODO.md
negative results), so this is another instance of the winning
decomposition: XLA owns every dot that is compute-bound; Pallas owns
every bandwidth chain.

Reference hot paths this accelerates: the Enformer value-net trainer
(/root/reference/train.py:150-208 analogue, train/value.py), DPS and
classifier guidance backward through the value trunk
(/root/reference/diffusion_gosai.py:1286-1371), and the RNA oracle
trainer (cli/train_oracle.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from svdd_tpu.ops.kernel_utils import default_on_tpu, live_offsets

Array = jnp.ndarray


def use_pallas_conv_bwd() -> bool:
  """Default ON on TPU (opt out with SVDD_PALLAS_CONV_BWD=0)."""
  return default_on_tpu('SVDD_PALLAS_CONV_BWD')


def _bwd_kernel(x_ref, ct_ref, wt_ref, dx_ref, dw_ref, *,
                offsets: tuple):
  """One (tn, l) block: dgrad + wgrad, dW accumulated across the grid."""
  import jax.experimental.pallas as pl

  x = x_ref[:]                                     # (tn, l, cin)
  ct = ct_ref[:]                                   # (tn, l, cout)
  tn, l, cin = x.shape
  cout = ct.shape[-1]
  n_taps = len(offsets)

  def shift(arr, off):
    # shifted(arr, off)[i] = arr[i + off], zero-filled (conv1d.py rule)
    if off > 0:
      return jnp.pad(arr[:, off:, :], ((0, 0), (0, off), (0, 0)))
    if off < 0:
      return jnp.pad(arr[:, :l + off, :], ((0, 0), (-off, 0), (0, 0)))
    return arr

  # ---- dgrad: dx[j] = sum_k ct[j - off_k] @ W_k^T ----
  z = jax.lax.dot_general(ct.reshape(tn * l, cout), wt_ref[:],
                          (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
  z = z.reshape(tn, l, n_taps * cin)
  dx = jnp.zeros((tn, l, cin), jnp.float32)
  for j, off in enumerate(offsets):
    dx = dx + shift(z[:, :, j * cin:(j + 1) * cin], -off)
  dx_ref[:] = dx.astype(dx_ref.dtype)

  # ---- wgrad: dW_k = x^T @ shift(ct, -off_k) ----
  i = pl.program_id(0)

  @pl.when(i == 0)
  def _():
    dw_ref[:] = jnp.zeros_like(dw_ref)

  x2 = x.reshape(tn * l, cin)
  for j, off in enumerate(offsets):
    ds = shift(ct, -off).reshape(tn * l, cout)
    dw_j = jax.lax.dot_general(x2, ds, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dw_ref[j * cin:(j + 1) * cin, :] += dw_j


def _pick_tile_n(n: int, l: int, cin: int, cout: int, k_live: int,
                 itemsize: int, budget: int = 80 * 2 ** 20) -> int:
  best = 0
  for cand in (1, 2, 4, 8, 16, 32, 64):
    if n % cand:
      continue
    rows = cand * l
    est = (2 * rows * (cin + cout) * itemsize   # x + ct double-buffered
           + 2 * rows * cin * itemsize          # dx double-buffered
           + rows * k_live * cin * 4            # z slab (f32)
           + rows * cin * 4                     # dx accumulator (f32)
           + rows * cout * itemsize             # shifted-ct transient
           + cout * k_live * cin * itemsize     # resident W^T stack
           + k_live * cin * cout * 4)           # dW accumulator
    if est <= budget:
      best = cand
  return best


@functools.partial(jax.jit, static_argnames=('dilation', 'interpret'))
def conv1d_bwd_pallas(x: Array, kernel: Array, ct: Array,
                      dilation: int = 1, interpret: bool = False):
  """Fused (dx, dkernel) for y = conv1d_shifted(x, kernel, None, d).

  x (N, L, Cin), kernel (K, Cin, Cout), ct (N, L, Cout). Dead taps
  (|off| >= L) receive zero grads, matching the forward's skip rule.
  dx is returned in x.dtype; dkernel in kernel.dtype (f32-accumulated).
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  n, l, cin = x.shape
  k_taps, _, cout = kernel.shape
  half = (k_taps - 1) // 2 * dilation
  offsets = tuple(live_offsets(k_taps, l, dilation))
  live = [(off + half) // dilation for off in offsets]
  tile_n = _pick_tile_n(n, l, cin, cout, len(live), x.dtype.itemsize)
  assert tile_n > 0 and live, 'caller must gate on conv_bwd_ok'
  wt = jnp.concatenate([kernel[k].T for k in live], axis=1)  # (cout,k*cin)
  body = functools.partial(_bwd_kernel, offsets=offsets)
  dx, dw = pl.pallas_call(
      body,
      grid=(n // tile_n,),
      in_specs=[
          pl.BlockSpec((tile_n, l, cin), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_n, l, cout), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((cout, len(live) * cin), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=(
          pl.BlockSpec((tile_n, l, cin), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((len(live) * cin, cout), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ),
      out_shape=(
          jax.ShapeDtypeStruct((n, l, cin), x.dtype),
          jax.ShapeDtypeStruct((len(live) * cin, cout), jnp.float32),
      ),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      cost_estimate=pl.CostEstimate(
          flops=2 * 2 * n * l * len(live) * cin * cout,
          bytes_accessed=(x.size + ct.size + x.size) * x.dtype.itemsize
          + wt.size * x.dtype.itemsize,
          transcendentals=0),
      interpret=interpret,
  )(x, ct.astype(x.dtype), wt.astype(x.dtype))

  dkernel = jnp.zeros(kernel.shape, jnp.float32)
  for j, k in enumerate(live):
    dkernel = dkernel.at[k].set(dw[j * cin:(j + 1) * cin, :])
  return dx, dkernel.astype(kernel.dtype)


def conv_bwd_ok(n: int, l: int, cin: int, cout: int, k_taps: int,
                dilation: int, itemsize: int) -> bool:
  """Shape gate: lane-dim channels must be 128-aligned for Mosaic, the
  tile picker must fit VMEM, and k=1 convs stay XLA (their backward is
  two plain dots XLA already runs at the ceiling)."""
  offsets = live_offsets(k_taps, l, dilation)
  return (len(offsets) > 1 and cin % 128 == 0 and cout % 128 == 0
          and _pick_tile_n(n, l, cin, cout, len(offsets), itemsize) > 0)
