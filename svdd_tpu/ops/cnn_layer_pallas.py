"""Fused CNN denoiser layer: bias + LayerNorm + dilated conv + relu +
residual in ONE Pallas kernel.

The MDLM denoiser (models/cnn.py, mirroring reference
models/dnaconv.py:196-205) runs, per layer,

    h = x + time_bias[:, None, :]        # per-sample conditioning
    h = LayerNorm(h)
    h = relu(conv1d(h, k=9, dilation=d))
    x = h + x                            # residual

Under plain XLA our matmul conv (ops/conv1d.py) materializes a
(N, L, K*C) im2col buffer in HBM per layer. At the SVDD-PM posterior
pass shape (N = B*M = 2560, L = 200, C = 128) that is ~1.2 GB written
+ read per conv — profiled at ~66 ms/step of pad_dynamic-update-slice
fusions plus ~40 ms/step of LN/reduce fusions re-reading it (trace
r1-pm). The layer is bandwidth-bound, the opposite regime of the
value tower's FLOP-bound convs where Pallas lost to XLA
(ops/fused_conv_pallas.py docstring).

This kernel reads the (TILE_N, L, C) block of x ONCE into VMEM and:
  1. adds the per-sample bias row, takes f32 LayerNorm stats (VPU),
  2. runs ONE dot (TILE_N*L, C) x (C, K_live*C) against the tap-stacked
     weight ("transposed im2col": taps stacked on the OUTPUT axis, so
     no in-VMEM concatenate of shifted inputs — Mosaic rejects
     tpu.concatenate on mismatched sublane offsets),
  3. shift-accumulates the K_live per-tap output slabs in VMEM
     (static pads/slices along L; dead taps whose |offset| >= L are
     dropped at trace time exactly like ops/conv1d.py:conv1d_shifted),
  4. applies conv bias + relu + the residual add, and writes the new
     x block — HBM traffic = x + bias + W + out, the floor.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _live_offsets(k_taps: int, dilation: int, length: int) -> list[int]:
  """Static tap offsets with |off| < L (conv1d.py dead-tap rule)."""
  half = (k_taps - 1) // 2 * dilation
  return [k * dilation - half for k in range(k_taps)
          if -length < k * dilation - half < length]


def _live_taps(k_taps: int, dilation: int, length: int) -> list[int]:
  half = (k_taps - 1) // 2 * dilation
  return [k for k in range(k_taps)
          if -length < k * dilation - half < length]


def _split_edge_min(offsets: tuple, l: int, force: str = '') -> int:
  """Split threshold for the tap-waste optimization (fwd AND bwd):
  when a layer's wide tap-stacked dots would discard >30% of their row
  FLOPs (out[i] += tapout[i+off] uses only l-|off| of l rows per tap),
  taps with |off| >= l//4 run as per-tap dots on contributing rows
  only. edge_min == l//4 matches the probe's measured default exactly
  (probe_dilation_layers.py:194, EDGE_DIV=4); at the flagship
  L=200/d=64 the classification is identical to the r4-shipped l//4+1
  — aligning removes the unprobed boundary case at shapes where an
  offset equals exactly l/4 (ADVICE r4).

  ``force`` is the probe A/B hook value ('0' = never split, '1' =
  split whenever any waste). It is read from SVDD_SPLIT_TAPS OUTSIDE
  the jitted kernels and threaded in as a static argument so the jit
  cache key stays honest — flipping the env mid-process retraces
  instead of silently serving the previous mode."""
  if force == '0':
    return l
  waste = sum(abs(o) for o in offsets) / max(len(offsets) * l, 1)
  return (l // 4) if (waste > 0.3 or force == '1'
                      and waste > 0) else l


def _split_flags() -> tuple:
  """(SVDD_SPLIT_TAPS, SVDD_SPLIT_WGRAD) read at CALL time by the
  non-jitted public wrappers below."""
  return (os.environ.get('SVDD_SPLIT_TAPS', ''),
          os.environ.get('SVDD_SPLIT_WGRAD', '0'))


def cnn_layer_reference(x: Array, bias_row: Array, ln_scale: Array,
                        ln_bias: Array, kernel: Array, conv_bias: Array,
                        dilation: int = 1, eps: float = 1e-6,
                        residual: Array | None = None) -> Array:
  """Pure-jnp reference: relu(conv(LN(x + bias_row))) + residual.

  ``residual`` defaults to x; the training path passes the
  pre-dropout activations (dnaconv.py:200-205 adds the residual from
  BEFORE the dropout)."""
  from svdd_tpu.ops.conv1d import conv1d_shifted
  h = x + bias_row[:, None, :].astype(x.dtype)
  h32 = h.astype(jnp.float32)
  mu = h32.mean(-1, keepdims=True)
  var = ((h32 - mu) ** 2).mean(-1, keepdims=True)
  h = ((h32 - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
  h = h * ln_scale.astype(x.dtype) + ln_bias.astype(x.dtype)
  # cast kernel/bias to the activation dtype (Conv1D does the same):
  # an f32 bias would promote the whole output to f32, diverging from
  # the Pallas kernel's x.dtype output — which breaks the custom-VJP
  # cotangent dtype under a bf16 CNN and silently upcasts training
  h = conv1d_shifted(h, kernel.astype(x.dtype),
                     None if conv_bias is None
                     else conv_bias.astype(x.dtype), dilation)
  return jax.nn.relu(h) + (x if residual is None else residual)


def _kernel(x_ref, br_ref, g_ref, b_ref, w_ref, cb_ref, o_ref, *,
            offsets: tuple, eps: float, out_dtype,
            split_force: str = ''):
  x = x_ref[:]                                    # (tn, l, c)
  tn, l, c = x.shape
  h = x.astype(jnp.float32) + br_ref[:].astype(jnp.float32)[:, None, :]
  mu = jnp.mean(h, axis=-1, keepdims=True)
  var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
  h = (h - mu) * jax.lax.rsqrt(var + eps)
  h = h * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
  h = h.astype(x.dtype)
  # Taps with a LARGE shift waste dot rows: out[i] += tapout[i + off]
  # uses only l-|off| of the l rows the wide dot computes for that
  # tap. At the flagship L=200 the dilation-64 layers (offsets
  # +-{64,128,192}) would discard 55% of their tap-dot FLOPs — when a
  # layer wastes >30% overall, its |off| >= l/4 taps run as per-tap
  # dots on just the contributing rows instead (measured 4.9 ->
  # 3.7/3.8 ms at (5120,200,128), two probe runs,
  # scripts/probe_dilation_layers.py; low-waste layers stay all-wide
  # — splitting d=16's +-64 taps measured neutral-to-worse, and the
  # all-wide path below is then byte-identical to the r3 kernel).
  # BIT-EXACT either way: identical multiplies, f32 accumulation in
  # the identical tap order (probe exact=True on hardware at all
  # dilations).
  edge_min = _split_edge_min(offsets, l, split_force)
  inner = [j for j, o in enumerate(offsets) if abs(o) < edge_min]
  y = None
  if inner:
    w_in = w_ref[:] if len(inner) == len(offsets) else \
        jnp.concatenate([w_ref[:, j * c:(j + 1) * c] for j in inner],
                        axis=1)
    # one wide dot: inner taps stacked along the OUTPUT axis
    y = jax.lax.dot_general(h.reshape(tn * l, c), w_in,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y.astype(x.dtype).reshape(tn, l, len(inner) * c)
  acc = jnp.zeros((tn, l, c), jnp.float32)
  for j, off in enumerate(offsets):
    if j in inner:
      slab = y[:, :, inner.index(j) * c:(inner.index(j) + 1) * c]
      # out[i] += tapout[i + off]
      if off >= 0:
        seg = slab[:, off:, :]
        pad = ((0, 0), (0, off), (0, 0))
      else:
        seg = slab[:, :l + off, :]
        pad = ((0, 0), (-off, 0), (0, 0))
      acc = acc + (jnp.pad(seg, pad) if off else slab).astype(jnp.float32)
    else:
      rows = l - abs(off)
      src = h[:, off:, :] if off >= 0 else h[:, :l + off, :]
      yj = jax.lax.dot_general(src.reshape(tn * rows, c),
                               w_ref[:, j * c:(j + 1) * c],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
      yj = yj.astype(x.dtype).reshape(tn, rows, c).astype(jnp.float32)
      pad = ((0, 0), (0, l - rows), (0, 0)) if off >= 0 \
          else ((0, 0), (l - rows, 0), (0, 0))
      acc = acc + jnp.pad(yj, pad)
  acc = acc + cb_ref[0].astype(jnp.float32)[None, None, :]
  out = jnp.maximum(acc, 0.0).astype(out_dtype) + x.astype(out_dtype)
  o_ref[:] = out


def _pick_tile_n(n: int, l: int, c: int, k_live: int,
                 budget: int = 80 * 2 ** 20) -> int:
  best = 0
  for cand in (8, 16, 32, 64, 128):
    if n % cand:
      continue
    rows = cand * l
    est = (2 * 2 * rows * c * 2           # x/out double-buffered bf16
           + rows * c * 4 * 2             # f32 h + acc
           + rows * k_live * c * 2        # y slab
           + c * k_live * c * 2)          # weight
    if est <= budget:
      best = cand
  return best


def cnn_layer_pallas(x: Array, bias_row: Array, ln_scale: Array,
                     ln_bias: Array, kernel: Array, conv_bias: Array,
                     dilation: int = 1, eps: float = 1e-6,
                     interpret: bool = False) -> Array:
  """Public non-jitted wrapper: reads the SVDD_SPLIT_TAPS probe hook
  at CALL time and threads it into the jit cache key (see
  _split_edge_min)."""
  return _cnn_layer_pallas_jit(x, bias_row, ln_scale, ln_bias, kernel,
                               conv_bias, dilation=dilation, eps=eps,
                               interpret=interpret,
                               split_force=_split_flags()[0])


@functools.partial(
    jax.jit,
    static_argnames=('dilation', 'eps', 'interpret', 'split_force'))
def _cnn_layer_pallas_jit(x: Array, bias_row: Array, ln_scale: Array,
                          ln_bias: Array, kernel: Array,
                          conv_bias: Array,
                          dilation: int = 1, eps: float = 1e-6,
                          interpret: bool = False,
                          split_force: str = '') -> Array:
  """relu(conv1d(LN(x + bias_row), kernel, dilation)) + x, fused.

  x (N, L, C); bias_row (N, C); ln_scale/ln_bias (C,);
  kernel (K, C, C) flax layout; conv_bias (C,). SAME padding.
  """
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  n, l, c = x.shape
  k_taps = kernel.shape[0]
  live = _live_taps(k_taps, dilation, l)
  offsets = tuple(_live_offsets(k_taps, dilation, l))
  # (C, K_live*C) tap-stacked weight
  w = jnp.concatenate([kernel[k] for k in live], axis=1)
  tile_n = _pick_tile_n(n, l, c, len(live))
  grid = (n // tile_n,)
  body = functools.partial(_kernel, offsets=offsets, eps=eps,
                           out_dtype=x.dtype, split_force=split_force)
  return pl.pallas_call(
      body,
      grid=grid,
      in_specs=[
          pl.BlockSpec((tile_n, l, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_n, c), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((c, len(live) * c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((tile_n, l, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, l, c), x.dtype),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      cost_estimate=pl.CostEstimate(
          flops=2 * n * l * len(live) * c * c,
          bytes_accessed=(x.size * 2 + bias_row.size + w.size) * 2,
          transcendentals=0),
      interpret=interpret,
  )(x, bias_row.astype(x.dtype), ln_scale.reshape(1, c),
    ln_bias.reshape(1, c), w.astype(x.dtype),
    conv_bias.reshape(1, c))


def _bwd_kernel(x_ref, br_ref, g_ref, b_ref, w_ref, wt_ref, cb_ref,
                ct_ref, dx_ref, dbr_ref, dw_ref, dg_ref, db_ref,
                dcb_ref, *, offsets: tuple, eps: float,
                split_force: str = '', split_wgrad: bool = False):
  """Full layer backward in one pass over a (tn, l, c) block.

  Recomputes h/acc with the EXACT forward-kernel math (same per-slab
  bf16 casts) so the relu mask matches the primal the Pallas forward
  produced, then:
    dgrad  = the mirror tap-stacked dot (dacc @ [W_j^T stacked]) with
             NEGATED shift-accumulate offsets,
    wgrad  = per-tap transposed-contraction dots h^T @ shift(dacc),
    LN bwd = standard channel-axis formula on the VPU,
  and accumulates dW/dgamma/dbeta/dconv_bias across the sequential
  grid (index_map pins their block; init at program 0)."""
  import jax.experimental.pallas as pl

  x = x_ref[:]                                    # (tn, l, c)
  tn, l, c = x.shape
  n_taps = len(offsets)

  def shift(arr, off):
    # shifted(arr, off)[i] = arr[i + off], zero-filled (conv1d.py rule)
    if off > 0:
      return jnp.pad(arr[:, off:, :], ((0, 0), (0, off), (0, 0)))
    if off < 0:
      return jnp.pad(arr[:, :l + off, :], ((0, 0), (-off, 0), (0, 0)))
    return arr

  # ---- forward recompute (identical op order to _kernel) ----
  h0 = x.astype(jnp.float32) + br_ref[:].astype(jnp.float32)[:, None, :]
  mu = jnp.mean(h0, axis=-1, keepdims=True)
  var = jnp.mean((h0 - mu) ** 2, axis=-1, keepdims=True)
  rstd = jax.lax.rsqrt(var + eps)
  hn = (h0 - mu) * rstd                           # f32
  gv = g_ref[0].astype(jnp.float32)
  hs = hn * gv + b_ref[0].astype(jnp.float32)
  h = hs.astype(x.dtype)                          # the fwd dot operand
  h2 = h.reshape(tn * l, c)

  # Split-tap rule (same as the forward _kernel): at high-waste
  # dilations the wide tap-stacked dots discard |off|/l of their row
  # FLOPs PER TAP. The fwd recompute (out[i] += tapout[i+off]) and the
  # dgrad mirror (dhs[i] += z[i-off]) run their edge taps as
  # restricted-row dots on contributing rows only — hardware-probed
  # BIT-EXACT (the dropped rows are discarded outputs) and 20% faster
  # at d=64/(256,200,128): 1.28 -> 1.03 ms
  # (scripts/probe_bwd_split.py r5). wgrad keeps the wide form — see
  # the split_wgrad note below.
  edge_min = _split_edge_min(offsets, l, split_force)
  inner = [j for j, o in enumerate(offsets) if abs(o) < edge_min]

  def _cols(ref, j):
    return ref[:, j * c:(j + 1) * c]

  def _gather_cols(ref, idxs):
    if len(idxs) == n_taps:
      return ref[:]
    return jnp.concatenate([_cols(ref, j) for j in idxs], axis=1)

  def _dot2(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

  y = None
  if inner:
    y = _dot2(h2, _gather_cols(w_ref, inner))
    y = y.astype(x.dtype).reshape(tn, l, len(inner) * c)
  acc = jnp.zeros((tn, l, c), jnp.float32)
  for j, off in enumerate(offsets):
    if j in inner:
      ji = inner.index(j)
      acc = acc + shift(y[:, :, ji * c:(ji + 1) * c], off).astype(
          jnp.float32)
    else:
      # out[i] += tapout[i + off]: only l-|off| out rows receive
      # anything; compute just those (identical to the fwd _kernel's
      # edge-tap branch, so the recomputed acc — and hence the relu
      # mask — matches the Pallas primal bit-for-bit)
      rows = l - abs(off)
      src = h[:, off:, :] if off >= 0 else h[:, :l + off, :]
      yj = _dot2(src.reshape(tn * rows, c), _cols(w_ref, j))
      yj = yj.astype(x.dtype).reshape(tn, rows, c).astype(jnp.float32)
      pad = ((0, 0), (0, l - rows), (0, 0)) if off >= 0 \
          else ((0, 0), (l - rows, 0), (0, 0))
      acc = acc + jnp.pad(yj, pad)
  acc = acc + cb_ref[0].astype(jnp.float32)[None, None, :]

  # ---- relu + conv-bias backward ----
  ct = ct_ref[:]
  dacc = jnp.where(acc > 0, ct.astype(jnp.float32), 0.0)   # (tn, l, c)
  dcb_blk = jnp.sum(dacc, axis=(0, 1)).reshape(1, c)

  # ---- dgrad: dh = sum_j shifted(dacc @ W_j^T, -off_j) ----
  da = dacc.astype(x.dtype)
  z = None
  if inner:
    z = _dot2(da.reshape(tn * l, c), _gather_cols(wt_ref, inner))
    z = z.reshape(tn, l, len(inner) * c)
  dhs = jnp.zeros((tn, l, c), jnp.float32)
  for j, off in enumerate(offsets):
    if j in inner:
      ji = inner.index(j)
      dhs = dhs + shift(z[:, :, ji * c:(ji + 1) * c], -off)
    else:
      # dhs[i] += (da @ Wj^T)[i - off]: da rows [0, l-off) land on dhs
      # rows [off, l) for off >= 0 (mirrored for off < 0) — compute
      # only the contributing da rows
      rows = l - abs(off)
      src = da[:, :rows, :] if off >= 0 else da[:, -rows:, :]
      qj = _dot2(src.reshape(tn * rows, c),
                 _cols(wt_ref, j)).reshape(tn, rows, c)
      pad = ((0, 0), (l - rows, 0), (0, 0)) if off >= 0 \
          else ((0, 0), (0, l - rows), (0, 0))
      dhs = dhs + jnp.pad(qj, pad)

  # ---- wgrad: dW_j = h^T @ shifted(dacc, -off_j) ----
  i = pl.program_id(0)

  @pl.when(i == 0)
  def _():
    dw_ref[:] = jnp.zeros_like(dw_ref)
    dg_ref[:] = jnp.zeros_like(dg_ref)
    db_ref[:] = jnp.zeros_like(db_ref)
    dcb_ref[:] = jnp.zeros_like(dcb_ref)

  def _dot_rows(a, b):
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

  # wgrad stays ALL-WIDE by default: the restricted-row contraction
  # variant measured SLOWER (d=64 @ (256,200,128): 1.03 ms nowgrad vs
  # 1.11 ms full-split vs 1.28 all-wide, scripts/probe_bwd_split.py
  # r5) AND not bit-exact (contracting fewer rows regroups the MXU
  # accumulation: dkernel rel diff 1.3e-3). SVDD_SPLIT_WGRAD=1 keeps
  # the measured-negative path reachable for probes.
  for j, off in enumerate(offsets):
    if j in inner or not split_wgrad:
      ds = shift(dacc, -off).astype(x.dtype).reshape(tn * l, c)
      dw_j = _dot_rows(h2, ds)
    else:
      # shift(dacc, -off)[i] = dacc[i-off]: the nonzero rows pair
      # h[off:] with dacc[:l-off] for off >= 0 (mirrored for off < 0)
      # — contract over the l-|off| contributing rows only
      rows = l - abs(off)
      hj = h[:, off:, :] if off >= 0 else h[:, :l + off, :]
      dj = dacc[:, :rows, :] if off >= 0 else dacc[:, -rows:, :]
      dw_j = _dot_rows(hj.reshape(tn * rows, c),
                       dj.astype(x.dtype).reshape(tn * rows, c))
    dw_ref[j * c:(j + 1) * c, :] += dw_j
  dcb_ref[:] += dcb_blk

  # ---- LayerNorm backward (channel axis) ----
  dg_ref[:] += jnp.sum(dhs * hn, axis=(0, 1)).reshape(1, c)
  db_ref[:] += jnp.sum(dhs, axis=(0, 1)).reshape(1, c)
  dhn = dhs * gv
  m1 = jnp.mean(dhn, axis=-1, keepdims=True)
  m2 = jnp.mean(dhn * hn, axis=-1, keepdims=True)
  dh0 = rstd * (dhn - m1 - hn * m2)
  dx_ref[:] = dh0.astype(x.dtype) + ct
  dbr_ref[:] = jnp.sum(dh0, axis=1).astype(dbr_ref.dtype)


def _pick_tile_n_bwd(n: int, l: int, c: int, k_live: int,
                     budget: int = 80 * 2 ** 20) -> int:
  best = 0
  for cand in (8, 16, 32, 64):
    if n % cand:
      continue
    rows = cand * l
    est = (3 * 2 * rows * c * 2            # x/ct/dx double-buffered bf16
           + 5 * rows * c * 4              # f32 h0/hn/acc/dacc/dhs
           + rows * k_live * c * 2         # y slab (bf16)
           + rows * k_live * c * 4         # z slab (f32)
           + rows * k_live * c * 2         # shifted-dacc transients
           + 2 * c * k_live * c * 2        # w + wt
           + k_live * c * c * 4)           # dW accumulator
    if est <= budget:
      best = cand
  return best


def cnn_layer_bwd_pallas(x: Array, bias_row: Array, ln_scale: Array,
                         ln_bias: Array, kernel: Array,
                         conv_bias: Array, ct: Array, dilation: int = 1,
                         eps: float = 1e-6, interpret: bool = False):
  """Public non-jitted wrapper: reads the SVDD_SPLIT_TAPS /
  SVDD_SPLIT_WGRAD probe hooks at CALL time and threads them into the
  jit cache key (see _split_edge_min)."""
  taps, wgrad = _split_flags()
  return _cnn_layer_bwd_pallas_jit(x, bias_row, ln_scale, ln_bias,
                                   kernel, conv_bias, ct,
                                   dilation=dilation, eps=eps,
                                   interpret=interpret,
                                   split_force=taps,
                                   split_wgrad=wgrad == '1')


@functools.partial(
    jax.jit,
    static_argnames=('dilation', 'eps', 'interpret', 'split_force',
                     'split_wgrad'))
def _cnn_layer_bwd_pallas_jit(x: Array, bias_row: Array,
                              ln_scale: Array, ln_bias: Array,
                              kernel: Array, conv_bias: Array,
                              ct: Array, dilation: int = 1,
                              eps: float = 1e-6,
                              interpret: bool = False,
                              split_force: str = '',
                              split_wgrad: bool = False):
  """Pallas VJP of cnn_layer_pallas: one fused kernel per block does
  forward-recompute (relu mask), dgrad, wgrad, and LN backward.

  Replaces the XLA route (jax.vjp through cnn_layer_reference), whose
  conv1d_shifted im2col forward + differentiated pad/slice/cotangent
  chains measured 85 TF/s in the diffusion-train backward bucket
  (TODO.md train roofline; reference hot path trainer.py:150-208).
  Returns (dx, dbias_row, dln_scale, dln_bias, dkernel, dconv_bias) in
  the primal dtypes."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  n, l, c = x.shape
  k_taps = kernel.shape[0]
  live = _live_taps(k_taps, dilation, l)
  offsets = tuple(_live_offsets(k_taps, dilation, l))
  tile_n = _pick_tile_n_bwd(n, l, c, len(live))
  if tile_n == 0 or not live:
    _, vjp = jax.vjp(
        lambda *a: cnn_layer_reference(*a, dilation=dilation, eps=eps),
        x, bias_row, ln_scale, ln_bias, kernel, conv_bias)
    return vjp(ct)
  w = jnp.concatenate([kernel[k] for k in live], axis=1)
  wt = jnp.concatenate([kernel[k].T for k in live], axis=1)
  grid = (n // tile_n,)
  body = functools.partial(_bwd_kernel, offsets=offsets, eps=eps,
                           split_force=split_force,
                           split_wgrad=split_wgrad)
  dx, dbr, dw, dg, db, dcb = pl.pallas_call(
      body,
      grid=grid,
      in_specs=[
          pl.BlockSpec((tile_n, l, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_n, c), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((c, len(live) * c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((c, len(live) * c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_n, l, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=(
          pl.BlockSpec((tile_n, l, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_n, c), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((len(live) * c, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ),
      out_shape=(
          jax.ShapeDtypeStruct((n, l, c), x.dtype),
          jax.ShapeDtypeStruct((n, c), bias_row.dtype),
          jax.ShapeDtypeStruct((len(live) * c, c), jnp.float32),
          jax.ShapeDtypeStruct((1, c), jnp.float32),
          jax.ShapeDtypeStruct((1, c), jnp.float32),
          jax.ShapeDtypeStruct((1, c), jnp.float32),
      ),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      cost_estimate=pl.CostEstimate(
          flops=3 * 2 * n * l * len(live) * c * c,
          bytes_accessed=(x.size * 3 + w.size * 2) * 2,
          transcendentals=0),
      interpret=interpret,
  )(x, bias_row.astype(x.dtype), ln_scale.reshape(1, c),
    ln_bias.reshape(1, c), w.astype(x.dtype), wt.astype(x.dtype),
    conv_bias.reshape(1, c), ct.astype(x.dtype))

  # scatter live-tap dW rows back into the full (K, Cin, Cout) kernel
  dkernel = jnp.zeros(kernel.shape, jnp.float32)
  for j, k in enumerate(live):
    dkernel = dkernel.at[k].set(dw[j * c:(j + 1) * c, :])
  return (dx, dbr.astype(bias_row.dtype),
          dg.reshape(c).astype(ln_scale.dtype),
          db.reshape(c).astype(ln_bias.dtype),
          dkernel.astype(kernel.dtype),
          dcb.reshape(c).astype(conv_bias.dtype))


def use_pallas_cnn_bwd() -> bool:
  """Default ON (opt out with SVDD_PALLAS_CNN_BWD=0)."""
  return os.environ.get('SVDD_PALLAS_CNN_BWD', '1') == '1'


# Mosaic compile cost for the fused BACKWARD kernel explodes at short
# lengths: ONE (64, 50, 128) d=1 bwd kernel takes 447 s to compile
# standalone (N=8 variant >500 s), and the ~5 distinct-dilation
# kernels of an RNA (L=50) DPS/classifier/train program starve the
# remote compile helper to a SIGKILL (r4, /tmp cli sweep; the same
# program with SVDD_PALLAS_CNN_BWD=0 compiles and runs normally).
# L=200 (DNA, the shape the kernel was built and tuned for) compiles
# in normal time. Gate the Pallas route to lengths near the tuned
# regime; the XLA reference VJP is cheap at small L anyway.
_PALLAS_BWD_MIN_L = 100


def pallas_bwd_len_ok(l: int) -> bool:
  """Length gate for the fused kernels (see _PALLAS_BWD_MIN_L).

  Gates the backward always, and the forward DISPATCHER
  (cnn_layer_fused) too: the L=50 fwd kernels cost 283 s of Mosaic
  compile for a +4%-in-noise decode win (r4 A/B). Direct
  cnn_layer_pallas calls (probes, interpret tests) stay ungated."""
  return l >= _PALLAS_BWD_MIN_L


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _fused_core(x, bias_row, ln_scale, ln_bias, kernel, conv_bias,
                dilation, eps, interpret):
  return cnn_layer_pallas(x, bias_row, ln_scale, ln_bias, kernel,
                          conv_bias, dilation=dilation, eps=eps,
                          interpret=interpret)


def _fused_fwd(x, bias_row, ln_scale, ln_bias, kernel, conv_bias,
               dilation, eps, interpret):
  out = cnn_layer_pallas(x, bias_row, ln_scale, ln_bias, kernel,
                         conv_bias, dilation=dilation, eps=eps,
                         interpret=interpret)
  return out, (x, bias_row, ln_scale, ln_bias, kernel, conv_bias)


def _fused_bwd(dilation, eps, interpret, res, ct):
  """Fused Pallas backward when enabled (diffusion pretrain, DPS /
  classifier guidance all take jax.grad through the denoiser); falls
  back to differentiating the jnp reference — always at short lengths
  (pallas_bwd_len_ok), where the Mosaic bwd compile starves the
  remote compiler."""
  # interpret mode (CPU tests) has no Mosaic compile, so the length
  # gate applies only to the compiled path
  if use_pallas_cnn_bwd() and (interpret
                               or pallas_bwd_len_ok(res[0].shape[1])):
    return cnn_layer_bwd_pallas(*res, ct, dilation=dilation, eps=eps,
                                interpret=interpret)
  _, vjp = jax.vjp(
      lambda *a: cnn_layer_reference(*a, dilation=dilation, eps=eps),
      *res)
  return vjp(ct)


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def use_pallas_cnn_layer() -> bool:
  """Default ON (opt out with SVDD_PALLAS_CNN_LAYER=0).

  Measured on v5e at the PM posterior-pass shape
  (2560, 200, 128, k=9, bf16): 2.3-2.4 ms/layer fused vs 7.3-12.1 ms
  for the XLA im2col path across dilations 1..64. End-to-end decode
  throughput: SVDD-PM 7.2 -> 16.9 seqs/sec/chip, SVDD-MC
  19.4 -> 20.6 (bench.py, B=256)."""
  return os.environ.get('SVDD_PALLAS_CNN_LAYER', '1') == '1'


def cnn_layer_fused(x: Array, bias_row: Array, ln_scale: Array,
                    ln_bias: Array, kernel: Array, conv_bias: Array,
                    dilation: int = 1, eps: float = 1e-6,
                    use_pallas: bool | None = None) -> Array:
  """Dispatcher: Pallas on TPU when shapes tile, jnp reference else.

  Short lengths also fall back (pallas_bwd_len_ok): Mosaic compile of
  the L=50 kernels is pathological (an RNA MC decode program measured
  283 s compile with the kernel vs 26 s without, r4 A/B
  /tmp/probe_rna_fwd.py) and buys only +4% decode (800 vs 769
  seqs/s, within run noise) — the kernel's 2.2x win lives at the
  DNA L=200 shapes it was tuned for."""
  n, l, c = x.shape
  k_taps, c_in, c_out = kernel.shape
  if use_pallas is None:
    use_pallas = use_pallas_cnn_layer()
  ok = (c_in == c and c_out == c and c % 128 == 0
        and len(_live_taps(k_taps, dilation, l)) > 0
        and _pick_tile_n(n, l, c, len(_live_taps(k_taps, dilation, l)))
        > 0
        and pallas_bwd_len_ok(l)
        and jax.default_backend() == 'tpu')
  if use_pallas and ok:
    return _fused_core(x, bias_row, ln_scale, ln_bias, kernel,
                       conv_bias, dilation, eps, False)
  return cnn_layer_reference(x, bias_row, ln_scale, ln_bias, kernel,
                             conv_bias, dilation=dilation, eps=eps)
