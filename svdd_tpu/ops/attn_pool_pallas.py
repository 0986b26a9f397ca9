"""Fused Enformer attention-pool (pool_size=2) Pallas kernel.

The value tower pools with enformer_pytorch-style attention pooling
(reference Enformer.py:2416-2460 via models/blocks.py:AttentionPool):

    logits = x @ W                    # (B, L, C), XLA matmul (MXU)
    out[b,i,c] = softmax over {x[2i], x[2i+1]} weighted sum

Under XLA the softmax-sum chain runs as three bandwidth-bound passes
over the (B, L, C) pair view (trace r2-b512: reduce + two loop fusions,
~35 ms/step of the B=512 SVDD-MC decode across the tower's 7 pools).
This kernel reads x and logits ONCE into VMEM and writes the pooled
output — the bandwidth floor.

Key trick (probe scripts/probe_attnpool_kernel.py): a pairwise softmax
is a sigmoid blend, out = x1 + (x0-x1)*sigmoid(l0-l1), and the pair
members sit ADJACENT along L, so the row-major in-VMEM reshape
(tn, l, c) -> (tn, l/2, 2c) exposes them as lane-dim halves — Mosaic
compiles that reshape + multiple-of-128 lane slices cleanly (measured
3.4x the XLA chain), whereas strided slices along L ("Only 2D gather")
and sublane-split reshapes both fail to lower.

Odd lengths: the caller pads x with zeros and logits with -inf to even
L first (same masking the reference applies, blocks.py:102-105).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def attn_pool_reference(x: Array, logits: Array) -> Array:
  """Grouped-softmax reference (blocks.py:111-114 semantics), p=2."""
  b, n, c = x.shape
  xg = x.reshape(b, n // 2, 2, c)
  lg = logits.astype(jnp.float32).reshape(b, n // 2, 2, c)
  attn = jax.nn.softmax(lg, axis=2)
  return (xg.astype(jnp.float32) * attn).sum(axis=2).astype(x.dtype)


def _kernel(x_ref, l_ref, o_ref):
  x = x_ref[:]
  tn, l, c = x.shape
  xw = x.reshape(tn, l // 2, 2 * c)
  lw = l_ref[:].astype(jnp.float32).reshape(tn, l // 2, 2 * c)
  x0 = xw[..., :c].astype(jnp.float32)
  x1 = xw[..., c:].astype(jnp.float32)
  w = jax.nn.sigmoid(lw[..., :c] - lw[..., c:])
  o_ref[:] = (x1 + (x0 - x1) * w).astype(x.dtype)


def _pick_tile_n(n: int, l: int, c: int,
                 budget: int = 96 * 2 ** 20) -> int:
  best = 0
  for cand in (1, 2, 4, 8, 16, 32, 64, 128):
    if n % cand:
      continue
    rows = cand * l * c
    est = (2 * rows * 2 * 2       # x + logits bf16, double-buffered
           + rows // 2 * 2        # out
           + 3 * rows * 4)        # f32 blend temps
    if est <= budget:
      best = cand
  return best


@functools.partial(jax.jit, static_argnames=('interpret',))
def attn_pool_pallas(x: Array, logits: Array,
                     interpret: bool = False) -> Array:
  """Pairwise attention pool; x, logits (N, L, C) with L even."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  n, l, c = x.shape
  tile_n = _pick_tile_n(n, l, c)
  return pl.pallas_call(
      _kernel,
      grid=(n // tile_n,),
      in_specs=[
          pl.BlockSpec((tile_n, l, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_n, l, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((tile_n, l // 2, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, l // 2, c), x.dtype),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      cost_estimate=pl.CostEstimate(
          flops=8 * n * l * c,
          bytes_accessed=x.size * 2 * 2 + x.size,
          transcendentals=n * l // 2 * c),
      interpret=interpret,
  )(x, logits)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_core(x, logits, interpret):
  return attn_pool_pallas(x, logits, interpret=interpret)


def _fused_fwd(x, logits, interpret):
  return attn_pool_pallas(x, logits, interpret=interpret), (x, logits)


def _fused_bwd(interpret, res, ct):
  # classifier guidance / DPS take jax.grad through the value net;
  # backward runs through the jnp reference (Pallas fwd only)
  _, vjp = jax.vjp(attn_pool_reference, *res)
  return vjp(ct)


_fused_core.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Mega kernel: pool blend -> next block's BN affine + act -> im2col slabs
# ---------------------------------------------------------------------------
#
# The pooled output's ONLY consumer inside the conv tower is the next
# k=5 NACDR ConvBlock (norm -> act -> conv). Emitting that conv's
# im2col buffer straight from the pool kernel removes every
# intermediate HBM array between the pool's logits matmul and the
# conv's single tap-stacked matmul: pooled x, the norm/act
# materialization, and the pad/DUS im2col build all stay in VMEM.


from svdd_tpu.ops.kernel_utils import (act as _act, default_on_tpu,
                                       live_offsets as _live_offsets)


def pool_prologue_im2col_reference(x: Array, logits: Array,
                                   scale: Array, shift: Array,
                                   k_taps: int, act: str | None
                                   ) -> Array:
  # compose the two single-purpose references: affine+act+slab
  # stacking lives in ONE place (im2col_pallas.nacdr_im2col_reference).
  # The pooled values stay f32 through the affine (kernel semantics);
  # the trailing cast is elementwise so post-concat == post-act.
  from svdd_tpu.ops.im2col_pallas import nacdr_im2col_reference
  return nacdr_im2col_reference(
      attn_pool_reference(x, logits), scale, shift, k_taps,
      act).astype(x.dtype)


def _mega_kernel(x_ref, l_ref, s_ref, t_ref, o_ref, *, offsets, act):
  x = x_ref[:]
  tn, l, c = x.shape
  lh = l // 2
  xw = x.reshape(tn, lh, 2 * c)
  lw = l_ref[:].astype(jnp.float32).reshape(tn, lh, 2 * c)
  x0 = xw[..., :c].astype(jnp.float32)
  x1 = xw[..., c:].astype(jnp.float32)
  w = jax.nn.sigmoid(lw[..., :c] - lw[..., c:])
  pooled = x1 + (x0 - x1) * w
  xg = _act(act, pooled * s_ref[0][None, None, :]
            + t_ref[0][None, None, :]).astype(x.dtype)
  for j, off in enumerate(offsets):
    if off >= 0:
      seg = jnp.pad(xg[:, off:, :], ((0, 0), (0, off), (0, 0)))
    else:
      seg = jnp.pad(xg[:, :lh + off, :], ((0, 0), (-off, 0), (0, 0)))
    o_ref[:, :, j * c:(j + 1) * c] = seg


def _pick_tile_n_mega(n: int, l: int, c: int, k_live: int,
                      budget: int = 56 * 2 ** 20) -> int:
  best = 0
  for cand in (1, 2, 4, 8, 16, 32, 64, 128):
    if n % cand:
      continue
    rows = cand * l * c          # full-length rows (pre-pool)
    est = (2 * rows * 2 * 2      # x + logits double-buffered bf16
           + 3 * rows * 4        # f32 blend temps
           + rows // 2 * 2       # activated pooled
           + 2 * rows // 2 * k_live * 2)   # cols out double-buffered
    if est <= budget:
      best = cand
  return best


@functools.partial(jax.jit, static_argnames=('k_taps', 'act',
                                             'interpret'))
def pool_prologue_im2col_pallas(x: Array, logits: Array, scale: Array,
                                shift: Array, k_taps: int,
                                act: str | None,
                                interpret: bool = False) -> Array:
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  n, l, c = x.shape
  lh = l // 2
  offsets = tuple(_live_offsets(k_taps, lh))
  k_live = len(offsets)
  tile_n = _pick_tile_n_mega(n, l, c, k_live)
  body = functools.partial(_mega_kernel, offsets=offsets, act=act)
  return pl.pallas_call(
      body,
      grid=(n // tile_n,),
      in_specs=[
          pl.BlockSpec((tile_n, l, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_n, l, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((tile_n, lh, k_live * c),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, lh, k_live * c), x.dtype),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      cost_estimate=pl.CostEstimate(
          flops=12 * n * l * c,
          bytes_accessed=x.size * 2 * 2 + n * lh * k_live * c * 2,
          transcendentals=n * l * c),
      interpret=interpret,
  )(x, logits, scale.reshape(1, c).astype(jnp.float32),
    shift.reshape(1, c).astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _mega_core(x, logits, scale, shift, k_taps, act, interpret):
  return pool_prologue_im2col_pallas(x, logits, scale, shift, k_taps,
                                     act, interpret=interpret)


def _mega_fwd(x, logits, scale, shift, k_taps, act, interpret):
  out = pool_prologue_im2col_pallas(x, logits, scale, shift, k_taps,
                                    act, interpret=interpret)
  return out, (x, logits, scale, shift)


def _mega_bwd(k_taps, act, interpret, res, ct):
  _, vjp = jax.vjp(
      lambda x, l, s, t: pool_prologue_im2col_reference(
          x, l, s, t, k_taps, act), *res)
  return vjp(ct)


_mega_core.defvjp(_mega_fwd, _mega_bwd)


def pool_prologue_im2col(x: Array, logits: Array, scale: Array,
                         shift: Array, k_taps: int, act: str | None,
                         use_pallas: bool | None = None) -> Array:
  """Dispatcher for the mega kernel; even-L inputs required."""
  n, l, c = x.shape
  if use_pallas is None:
    use_pallas = use_pallas_attn_pool()
  k_live = len(_live_offsets(k_taps, l // 2))
  ok = (l % 2 == 0 and c % 128 == 0
        and _pick_tile_n_mega(n, l, c, k_live) > 0)
  if use_pallas and ok:
    return _mega_core(x, logits, scale, shift, k_taps, act, False)
  return pool_prologue_im2col_reference(x, logits, scale, shift,
                                        k_taps, act)


def use_pallas_attn_pool() -> bool:
  """Default ON for TPU (opt out with SVDD_PALLAS_ATTN_POOL=0)."""
  return default_on_tpu('SVDD_PALLAS_ATTN_POOL')


def attn_pool_fused(x: Array, logits: Array,
                    use_pallas: bool | None = None) -> Array:
  """Dispatcher: Pallas when the (even-L, 128-aligned C) shape tiles,
  jnp reference otherwise. Inputs must already be even-L padded."""
  n, l, c = x.shape
  if use_pallas is None:
    use_pallas = use_pallas_attn_pool()
  ok = (l % 2 == 0 and c % 128 == 0 and _pick_tile_n(n, l, c) > 0)
  if use_pallas and ok:
    return _fused_core(x, logits, False)
  return attn_pool_reference(x, logits)


# ---------------------------------------------------------------------------
# W-logits variants: the attention-pool logits matmul moves INTO the
# kernel as a pairwise-DIFFERENCE dot
# ---------------------------------------------------------------------------
#
# The sigmoid blend only consumes l0 - l1 = (x0 - x1) @ W, so computing
# logits inside the kernel costs HALF the FLOPs of the XLA logits
# matmul (which evaluates x @ W at every position) and the dot hides
# under the kernel's DMA time. What this deletes from the step
# (trace r2-final, B*M=5120): the per-pool XLA logits matmuls
# (~15.9 ms), the relayout copies XLA inserted between those matmuls
# and the Pallas kernels (~5.7 ms, blocks.py:101), the odd-L -inf
# logits pads (~2 ms), and the logits HBM round-trip itself (the
# im2col kernels' input traffic halves).
#
# Odd-L handling changes shape: the caller still zero-pads x to even L,
# but there is no logits array to -inf pad — instead the kernel forces
# the tail pair's blend weight to 1 (select x0, exactly what the -inf
# pad achieved; blocks.py:102-105, Enformer.py:2447-2452).


def attn_pool_wlogits_reference(x: Array, w: Array, mask_tail: bool,
                                residual: Array | None = None) -> Array:
  """Reference: logits = x @ w then grouped softmax; x even-L padded,
  mask_tail=True when the last pair's second slot is padding.
  ``residual`` is added to x BEFORE the logits (the pool block's
  R step, Enformer.py:2283-2288, absorbed into the kernel so the
  summed array never materializes in HBM)."""
  if residual is not None:
    x = x + residual
  logits = jnp.dot(x, w.astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
  if mask_tail:
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, logits.dtype)
    logits = logits.at[:, -1, :].set(neg)
  return attn_pool_reference(x, logits)


def _pool_wlogits_blend(x, w_ref, *, mask_tail):
  """Shared in-VMEM blend: (tn, l, c) bf16/f32 -> pooled (tn, l/2, c)
  f32, with logits computed as the pairwise-difference dot."""
  tn, l, c = x.shape
  lh = l // 2
  xw = x.reshape(tn, lh, 2 * c)
  x0 = xw[..., :c].astype(jnp.float32)
  x1 = xw[..., c:].astype(jnp.float32)
  d = x0 - x1
  ld = jax.lax.dot_general(
      d.astype(x.dtype).reshape(tn * lh, c), w_ref[:],
      (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32).reshape(tn, lh, c)
  wgt = jax.nn.sigmoid(ld)
  if mask_tail:
    pos = jax.lax.broadcasted_iota(jnp.int32, (tn, lh, c), 1)
    wgt = jnp.where(pos == lh - 1, 1.0, wgt)
  return x1 + d * wgt


def _wl_kernel(x_ref, *rest, mask_tail, has_res):
  if has_res:
    res_ref, w_ref, o_ref = rest
  else:
    w_ref, o_ref = rest
  x = x_ref[:]
  if has_res:
    x = x + res_ref[:]
  o_ref[:] = _pool_wlogits_blend(x, w_ref,
                                 mask_tail=mask_tail).astype(x.dtype)


def _pick_tile_n_wl(n: int, l: int, c: int, has_res: bool = False,
                    budget: int = 60 * 2 ** 20) -> int:
  # f32 blend temps live on HALF rows (post-pool); tile=16 on the stem
  # shape measured ~1.9 ms faster than the earlier full-rows estimate's
  # tile=8, tile=32 regressed (probe_wl_variants, r2)
  best = 0
  for cand in (1, 2, 4, 8, 16, 32, 64, 128, 256):
    if n % cand:
      continue
    rows = cand * l * c
    est = ((4 if has_res else 2) * rows * 2   # x (+res) double-buffered
           + 4 * (rows // 2) * 4     # f32 blend temps (x0/x1/d/ld)
           + c * c * 2               # resident W
           + 2 * (rows // 2) * 2)    # out double-buffered
    if est <= budget:
      best = cand
  return best


@functools.partial(jax.jit, static_argnames=('mask_tail', 'interpret'))
def attn_pool_wlogits_pallas(x: Array, w: Array, mask_tail: bool,
                             residual: Array | None = None,
                             interpret: bool = False) -> Array:
  """Pairwise attention pool with the in-kernel difference-logits dot;
  x (N, L, C) zero-padded to even L, w (C, C). ``residual`` (same
  shape/pad as x) is added in-VMEM before the pool."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  n, l, c = x.shape
  has_res = residual is not None
  tile_n = _pick_tile_n_wl(n, l, c, has_res=has_res)
  body = functools.partial(_wl_kernel, mask_tail=mask_tail,
                           has_res=has_res)
  xspec = pl.BlockSpec((tile_n, l, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
  in_specs = [xspec] + ([xspec] if has_res else []) + [
      pl.BlockSpec((c, c), lambda i: (0, 0),
                   memory_space=pltpu.VMEM)]
  args = (x,) + ((residual,) if has_res else ()) + (w.astype(x.dtype),)
  return pl.pallas_call(
      body,
      grid=(n // tile_n,),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((tile_n, l // 2, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, l // 2, c), x.dtype),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      cost_estimate=pl.CostEstimate(
          flops=n * l * c * c + 8 * n * l * c,
          bytes_accessed=x.size * 2 * (2 if has_res else 1) + x.size,
          transcendentals=n * l // 2 * c),
      interpret=interpret,
  )(*args)


def _wl_bwd_kernel(x_ref, *rest, mask_tail, has_res):
  """Backward of the w-logits pool blend in one VMEM pass.

  out = x1 + d*sigmoid(d@W) with d = x0-x1 (pairs = lane halves), so
    dld = ct*d * wgt*(1-wgt)        (zeroed at the forced tail pair),
    dx0 = ct*wgt + dld@W^T,  dx1 = ct - dx0,
    dW  = d^T @ dld                 (accumulated across the grid),
  which matches jax.vjp of attn_pool_wlogits_reference: the reference's
  per-position dlogits are +/-dld, and its -inf tail masking kills the
  same tail terms. dres (when present) equals dx and is emitted by the
  wrapper as the same array."""
  import jax.experimental.pallas as pl

  if has_res:
    res_ref, w_ref, wt_ref, ct_ref, dx_ref, dw_ref = rest
  else:
    w_ref, wt_ref, ct_ref, dx_ref, dw_ref = rest
  x = x_ref[:]
  if has_res:
    x = x + res_ref[:]
  tn, l, c = x.shape
  lh = l // 2
  xw = x.reshape(tn, lh, 2 * c)
  x0 = xw[..., :c].astype(jnp.float32)
  x1 = xw[..., c:].astype(jnp.float32)
  d = x0 - x1
  db = d.astype(x.dtype)
  ld = jax.lax.dot_general(
      db.reshape(tn * lh, c), w_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32).reshape(tn, lh, c)
  wgt = jax.nn.sigmoid(ld)
  ct = ct_ref[:].astype(jnp.float32)
  if mask_tail:
    pos = jax.lax.broadcasted_iota(jnp.int32, (tn, lh, c), 1)
    wgt = jnp.where(pos == lh - 1, 1.0, wgt)
    dld = jnp.where(pos == lh - 1, 0.0, ct * d * wgt * (1.0 - wgt))
  else:
    dld = ct * d * wgt * (1.0 - wgt)
  dd1 = jax.lax.dot_general(
      dld.astype(x.dtype).reshape(tn * lh, c), wt_ref[:],
      (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32).reshape(tn, lh, c)
  dx0 = ct * wgt + dd1
  dx1 = ct - dx0
  dx_ref[:] = jnp.concatenate(
      [dx0, dx1], axis=-1).reshape(tn, l, c).astype(dx_ref.dtype)

  i = pl.program_id(0)

  @pl.when(i == 0)
  def _():
    dw_ref[:] = jnp.zeros_like(dw_ref)

  dw_ref[:] += jax.lax.dot_general(
      db.reshape(tn * lh, c), dld.astype(x.dtype).reshape(tn * lh, c),
      (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _pick_tile_n_wl_bwd(n: int, l: int, c: int, itemsize: int,
                        has_res: bool = False,
                        budget: int = 80 * 2 ** 20) -> int:
  best = 0
  for cand in (1, 2, 4, 8, 16, 32, 64, 128):
    if n % cand:
      continue
    rows = cand * l * c
    est = ((4 if has_res else 2) * rows * itemsize  # x (+res) dbl-buf
           + 2 * (rows // 2) * itemsize             # ct double-buffered
           + 2 * rows * itemsize                    # dx double-buffered
           + 10 * (rows // 2) * 4                   # f32 blend temps
           + 2 * c * c * itemsize                   # resident W + W^T
           + c * c * 4)                             # dW accumulator
    if est <= budget:
      best = cand
  return best


@functools.partial(jax.jit, static_argnames=('mask_tail', 'interpret'))
def attn_pool_wlogits_bwd_pallas(x: Array, w: Array, ct: Array,
                                 mask_tail: bool,
                                 residual: Array | None = None,
                                 interpret: bool = False):
  """Fused (dx, dW) for the w-logits pool; dres == dx (the blend sees
  only x+residual, so the wrapper returns the same array for both).
  Replaces the XLA route (jax.vjp of attn_pool_wlogits_reference),
  which re-runs the logits matmul plus softmax backward as
  bandwidth-bound passes — measured 29-49 TF/s in the value-net grad
  step (TODO.md value roofline)."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  n, l, c = x.shape
  has_res = residual is not None
  tile_n = _pick_tile_n_wl_bwd(n, l, c, x.dtype.itemsize,
                               has_res=has_res)
  assert tile_n > 0, 'caller must gate on pool_bwd_ok'
  body = functools.partial(_wl_bwd_kernel, mask_tail=mask_tail,
                           has_res=has_res)
  xspec = pl.BlockSpec((tile_n, l, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
  wspec = pl.BlockSpec((c, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
  in_specs = [xspec] + ([xspec] if has_res else []) + [
      wspec, wspec,
      pl.BlockSpec((tile_n, l // 2, c), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM)]
  wc = w.astype(x.dtype)
  args = ((x,) + ((residual,) if has_res else ())
          + (wc, wc.T, ct.astype(x.dtype)))
  dx, dw = pl.pallas_call(
      body,
      grid=(n // tile_n,),
      in_specs=in_specs,
      out_specs=(xspec, wspec),
      out_shape=(jax.ShapeDtypeStruct((n, l, c), x.dtype),
                 jax.ShapeDtypeStruct((c, c), jnp.float32)),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      cost_estimate=pl.CostEstimate(
          flops=3 * n * l * c * c + 16 * n * l * c,
          bytes_accessed=(x.size * (2 if has_res else 1)
                          + x.size // 2 + x.size) * x.dtype.itemsize,
          transcendentals=n * l // 2 * c),
      interpret=interpret,
  )(*args)
  return dx, dw.astype(w.dtype)


def use_pallas_pool_bwd() -> bool:
  """Default ON on TPU (opt out with SVDD_PALLAS_POOL_BWD=0)."""
  from svdd_tpu.ops.kernel_utils import default_on_tpu
  return default_on_tpu('SVDD_PALLAS_POOL_BWD')


def _pool_bwd_ok(n: int, l: int, c: int, itemsize: int,
                 has_res: bool) -> bool:
  return (l % 2 == 0 and c % 128 == 0
          and _pick_tile_n_wl_bwd(n, l, c, itemsize,
                                  has_res=has_res) > 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _wl_core(x, w, mask_tail, interpret):
  return attn_pool_wlogits_pallas(x, w, mask_tail, interpret=interpret)


def _wl_fwd(x, w, mask_tail, interpret):
  return attn_pool_wlogits_pallas(x, w, mask_tail,
                                  interpret=interpret), (x, w)


def _wl_bwd(mask_tail, interpret, res, ct):
  # interpret=True (the testing path) always takes the Pallas bwd in
  # interpret mode so CPU tests exercise the kernel's grad wiring
  x, w = res
  n, l, c = x.shape
  if ((interpret or use_pallas_pool_bwd())
      and _pool_bwd_ok(n, l, c, x.dtype.itemsize, has_res=False)):
    return attn_pool_wlogits_bwd_pallas(x, w, ct, mask_tail,
                                        interpret=interpret)
  _, vjp = jax.vjp(
      lambda x, w: attn_pool_wlogits_reference(x, w, mask_tail), *res)
  return vjp(ct)


_wl_core.defvjp(_wl_fwd, _wl_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _wl_res_core(x, res, w, mask_tail, interpret):
  return attn_pool_wlogits_pallas(x, w, mask_tail, residual=res,
                                  interpret=interpret)


def _wl_res_fwd(x, res, w, mask_tail, interpret):
  out = attn_pool_wlogits_pallas(x, w, mask_tail, residual=res,
                                 interpret=interpret)
  return out, (x, res, w)


def _wl_res_bwd(mask_tail, interpret, saved, ct):
  x, res, w = saved
  n, l, c = x.shape
  if ((interpret or use_pallas_pool_bwd())
      and _pool_bwd_ok(n, l, c, x.dtype.itemsize, has_res=True)):
    dx, dw = attn_pool_wlogits_bwd_pallas(x, w, ct, mask_tail,
                                          residual=res,
                                          interpret=interpret)
    # the blend consumes only x+residual, so both grads are dx
    return dx, dx, dw
  _, vjp = jax.vjp(
      lambda x, r, w: attn_pool_wlogits_reference(x, w, mask_tail, r),
      *saved)
  return vjp(ct)


_wl_res_core.defvjp(_wl_res_fwd, _wl_res_bwd)


def attn_pool_wlogits(x: Array, w: Array, mask_tail: bool,
                      residual: Array | None = None,
                      use_pallas: bool | None = None) -> Array:
  """Dispatcher; x (and residual) already even-L zero-padded."""
  n, l, c = x.shape
  if use_pallas is None:
    use_pallas = use_pallas_attn_pool()
  has_res = residual is not None
  ok = (l % 2 == 0 and c % 128 == 0
        and _pick_tile_n_wl(n, l, c, has_res=has_res) > 0)
  if use_pallas and ok:
    if has_res:
      return _wl_res_core(x, residual, w, mask_tail, False)
    return _wl_core(x, w, mask_tail, False)
  return attn_pool_wlogits_reference(x, w, mask_tail, residual)


def pool_prologue_im2col_wlogits_reference(
    x: Array, w: Array, scale: Array, shift: Array, k_taps: int,
    act: str | None, mask_tail: bool,
    residual: Array | None = None) -> Array:
  from svdd_tpu.ops.im2col_pallas import nacdr_im2col_reference
  return nacdr_im2col_reference(
      attn_pool_wlogits_reference(x, w, mask_tail, residual),
      scale, shift, k_taps, act).astype(x.dtype)


def _wl_mega_kernel(x_ref, *rest, offsets, act, mask_tail,
                    has_res=False):
  if has_res:
    res_ref, w_ref, s_ref, t_ref, o_ref = rest
  else:
    w_ref, s_ref, t_ref, o_ref = rest
  x = x_ref[:]
  if has_res:
    x = x + res_ref[:]
  tn, l, c = x.shape
  lh = l // 2
  pooled = _pool_wlogits_blend(x, w_ref, mask_tail=mask_tail)
  xg = _act(act, pooled * s_ref[0][None, None, :]
            + t_ref[0][None, None, :]).astype(x.dtype)
  for j, off in enumerate(offsets):
    if off >= 0:
      seg = jnp.pad(xg[:, off:, :], ((0, 0), (0, off), (0, 0)))
    else:
      seg = jnp.pad(xg[:, :lh + off, :], ((0, 0), (-off, 0), (0, 0)))
    o_ref[:, :, j * c:(j + 1) * c] = seg


_MEASURED_TILES = {
    # (l, c) -> tile; probe_wl_tile_sweep r2: the budget heuristic's
    # pick loses only on the (100, 768) block (tile 32 is 0.24 ms
    # slower than 8 there)
    (100, 768): 8,
}


def _pick_tile_n_wl_mega(n: int, l: int, c: int, k_live: int,
                         has_res: bool = False,
                         budget: int = 60 * 2 ** 20) -> int:
  # see _pick_tile_n_wl: temps on half rows; stem lands on tile=16
  # (measured best), larger tiles exceed the budget and measured worse
  pinned = _MEASURED_TILES.get((l, c))
  if pinned and n % pinned == 0:
    return pinned
  best = 0
  for cand in (1, 2, 4, 8, 16, 32, 64, 128):
    if n % cand:
      continue
    rows = cand * l * c
    est = ((4 if has_res else 2) * rows * 2   # x (+res) double-buffered
           + 4 * (rows // 2) * 4     # f32 blend temps
           + c * c * 2               # resident W
           + rows // 2 * 2           # activated pooled
           + 2 * (rows // 2) * k_live * 2)  # cols out double-buffered
    if est <= budget:
      best = cand
  return best


@functools.partial(jax.jit, static_argnames=('k_taps', 'act',
                                             'mask_tail', 'interpret'))
def pool_prologue_im2col_wlogits_pallas(
    x: Array, w: Array, scale: Array, shift: Array, k_taps: int,
    act: str | None, mask_tail: bool, residual: Array | None = None,
    interpret: bool = False) -> Array:
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  n, l, c = x.shape
  lh = l // 2
  offsets = tuple(_live_offsets(k_taps, lh))
  k_live = len(offsets)
  has_res = residual is not None
  tile_n = _pick_tile_n_wl_mega(n, l, c, k_live, has_res=has_res)
  body = functools.partial(_wl_mega_kernel, offsets=offsets, act=act,
                           mask_tail=mask_tail, has_res=has_res)
  xspec = pl.BlockSpec((tile_n, l, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
  row = lambda cc: pl.BlockSpec((1, cc), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
  in_specs = [xspec] + ([xspec] if has_res else []) + [
      pl.BlockSpec((c, c), lambda i: (0, 0),
                   memory_space=pltpu.VMEM), row(c), row(c)]
  args = ((x,) + ((residual,) if has_res else ())
          + (w.astype(x.dtype),
             scale.reshape(1, c).astype(jnp.float32),
             shift.reshape(1, c).astype(jnp.float32)))
  return pl.pallas_call(
      body,
      grid=(n // tile_n,),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((tile_n, lh, k_live * c),
                             lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, lh, k_live * c), x.dtype),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      cost_estimate=pl.CostEstimate(
          flops=n * l * c * c + 12 * n * l * c,
          bytes_accessed=(x.size * 2 * (2 if has_res else 1)
                          + n * lh * k_live * c * 2),
          transcendentals=n * l * c),
      interpret=interpret,
  )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _wl_mega_core(x, w, scale, shift, k_taps, act, mask_tail,
                  interpret):
  return pool_prologue_im2col_wlogits_pallas(
      x, w, scale, shift, k_taps, act, mask_tail, interpret=interpret)


def _wl_mega_fwd(x, w, scale, shift, k_taps, act, mask_tail,
                 interpret):
  out = pool_prologue_im2col_wlogits_pallas(
      x, w, scale, shift, k_taps, act, mask_tail, interpret=interpret)
  return out, (x, w, scale, shift)


def _wl_mega_bwd(k_taps, act, mask_tail, interpret, res, ct):
  _, vjp = jax.vjp(
      lambda x, w, s, t: pool_prologue_im2col_wlogits_reference(
          x, w, s, t, k_taps, act, mask_tail), *res)
  return vjp(ct)


_wl_mega_core.defvjp(_wl_mega_fwd, _wl_mega_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _wl_mega_res_core(x, res, w, scale, shift, k_taps, act, mask_tail,
                      interpret):
  return pool_prologue_im2col_wlogits_pallas(
      x, w, scale, shift, k_taps, act, mask_tail, residual=res,
      interpret=interpret)


def _wl_mega_res_fwd(x, res, w, scale, shift, k_taps, act, mask_tail,
                     interpret):
  out = pool_prologue_im2col_wlogits_pallas(
      x, w, scale, shift, k_taps, act, mask_tail, residual=res,
      interpret=interpret)
  return out, (x, res, w, scale, shift)


def _wl_mega_res_bwd(k_taps, act, mask_tail, interpret, saved, ct):
  _, vjp = jax.vjp(
      lambda x, r, w, s, t: pool_prologue_im2col_wlogits_reference(
          x, w, s, t, k_taps, act, mask_tail, r), *saved)
  return vjp(ct)


_wl_mega_res_core.defvjp(_wl_mega_res_fwd, _wl_mega_res_bwd)


def pool_prologue_im2col_wlogits(x: Array, w: Array, scale: Array,
                                 shift: Array, k_taps: int,
                                 act: str | None, mask_tail: bool,
                                 residual: Array | None = None,
                                 use_pallas: bool | None = None
                                 ) -> Array:
  """Dispatcher for the w-logits mega kernel; even-L inputs required."""
  n, l, c = x.shape
  if use_pallas is None:
    use_pallas = use_pallas_attn_pool()
  k_live = len(_live_offsets(k_taps, l // 2))
  has_res = residual is not None
  ok = (l % 2 == 0 and c % 128 == 0
        and _pick_tile_n_wl_mega(n, l, c, k_live, has_res=has_res) > 0)
  if use_pallas and ok:
    if has_res:
      return _wl_mega_res_core(x, residual, w, scale, shift, k_taps,
                               act, mask_tail, False)
    return _wl_mega_core(x, w, scale, shift, k_taps, act, mask_tail,
                         False)
  return pool_prologue_im2col_wlogits_reference(x, w, scale, shift,
                                                k_taps, act, mask_tail,
                                                residual)


def wlogits_pool_ok(l_padded: int, c: int) -> bool:
  """Shape gate the MODULE uses to decide whether to skip the XLA
  logits matmul and hand the kernel the weight instead (the kernels
  fall back to the jnp reference when use_pallas is off, so this only
  checks the shape contract, not the backend)."""
  return l_padded % 2 == 0 and c % 128 == 0


# ---------------------------------------------------------------------------
# LNC (L-major) kernel variants
# ---------------------------------------------------------------------------
# Layout ground truth (optimized-HLO dump, r2): XLA assigns rank-3
# (N, L, C) dot outputs the {2,0,1} physical layout — L outermost —
# while Pallas custom calls constrain operands/results to the default
# {2,1,0}. Every kernel boundary in the NLC tower therefore pays a
# relayout copy (~10 ms/step at B*M=5120) plus odd-L pad passes.
#
# The LNC variants run the tower logically as (L, N, C): its DEFAULT
# layout is exactly the dot-preferred physical layout, so conv matmul
# outputs flow into these kernels (and kernel cols flow into the next
# matmul) with zero copies. In-kernel the blocks are (l, tile_n, c) —
# minor dims (tile_n, c) are perfectly (8,128)-tiled, pairs are
# adjacent LEADING-dim slabs (no lane-split reshape), and im2col
# offsets are static leading-dim ref stores.
#
# ``pad_out`` appends one all-zero output slab so an odd pooled length
# is emitted even: the downstream conv matmul produces a zero raw row
# there (bias is deferred, ops/conv1d.py), and the next pool's
# mask_tail blend ignores it — the XLA pad passes disappear entirely.


def _pool_wlogits_blend_lnc(x, w_ref, *, mask_tail):
  """In-VMEM blend on (l, tn, c) blocks -> pooled (l/2, tn, c) f32.
  Pairs are adjacent leading-dim slabs; logits are the pairwise-
  difference dot, so constant channel offsets cancel."""
  l, tn, c = x.shape
  lh = l // 2
  xp = x.reshape(lh, 2, tn, c)
  x0 = xp[:, 0].astype(jnp.float32)
  x1 = xp[:, 1].astype(jnp.float32)
  d = x0 - x1
  ld = jax.lax.dot_general(
      d.astype(x.dtype).reshape(lh * tn, c), w_ref[:],
      (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32).reshape(lh, tn, c)
  wgt = jax.nn.sigmoid(ld)
  if mask_tail:
    pos = jax.lax.broadcasted_iota(jnp.int32, (lh, tn, c), 0)
    wgt = jnp.where(pos == lh - 1, 1.0, wgt)
  return x1 + d * wgt


def _wl_kernel_lnc(x_ref, *rest, mask_tail, has_res):
  if has_res:
    res_ref, w_ref, o_ref = rest
  else:
    w_ref, o_ref = rest
  x = x_ref[:]
  if has_res:
    x = x + res_ref[:]
  o_ref[:] = _pool_wlogits_blend_lnc(
      x, w_ref, mask_tail=mask_tail).astype(x.dtype)


def _pick_tile_n_lnc(n: int, l: int, c: int, k_live: int = 0,
                     has_res: bool = False,
                     budget: int = 60 * 2 ** 20) -> int:
  """tile over N (minor-2 dim): multiples of 8 that divide n."""
  best = 0
  for cand in (8, 16, 32, 64, 128, 256):
    if n % cand:
      continue
    rows = l * cand * c
    est = ((4 if has_res else 2) * rows * 2   # x (+res) double-buffered
           + 4 * (rows // 2) * 4              # f32 blend temps
           + c * c * 2                        # resident W
           + (rows // 2 * 2 if k_live else 0)       # activated pooled
           + 2 * (rows // 2) * max(k_live, 1) * 2)  # out double-buffered
    if est <= budget:
      best = cand
  return best


@functools.partial(jax.jit, static_argnames=('mask_tail', 'interpret'))
def attn_pool_wlogits_lnc_pallas(x: Array, w: Array, mask_tail: bool,
                                 residual: Array | None = None,
                                 interpret: bool = False) -> Array:
  """LNC pairwise attention pool; x (L, N, C) with L even."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  l, n, c = x.shape
  has_res = residual is not None
  tile_n = _pick_tile_n_lnc(n, l, c, has_res=has_res)
  body = functools.partial(_wl_kernel_lnc, mask_tail=mask_tail,
                           has_res=has_res)
  xspec = pl.BlockSpec((l, tile_n, c), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
  in_specs = [xspec] + ([xspec] if has_res else []) + [
      pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM)]
  args = (x,) + ((residual,) if has_res else ()) + (w.astype(x.dtype),)
  return pl.pallas_call(
      body,
      grid=(n // tile_n,),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((l // 2, tile_n, c), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((l // 2, n, c), x.dtype),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      cost_estimate=pl.CostEstimate(
          flops=n * l * c * c // 2 + 8 * n * l * c,
          bytes_accessed=x.size * 2 * (2 if has_res else 1) + x.size,
          transcendentals=n * l // 2 * c),
      interpret=interpret,
  )(*args)


def attn_pool_wlogits_lnc_reference(x: Array, w: Array, mask_tail: bool,
                                    residual: Array | None = None
                                    ) -> Array:
  nlc = jnp.transpose(x, (1, 0, 2))
  res = None if residual is None else jnp.transpose(residual, (1, 0, 2))
  out = attn_pool_wlogits_reference(nlc, w, mask_tail, res)
  return jnp.transpose(out, (1, 0, 2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _wl_lnc_core(x, res, w, mask_tail, interpret):
  return attn_pool_wlogits_lnc_pallas(x, w, mask_tail, residual=res,
                                      interpret=interpret)


def _wl_lnc_fwd(x, res, w, mask_tail, interpret):
  out = attn_pool_wlogits_lnc_pallas(x, w, mask_tail, residual=res,
                                     interpret=interpret)
  return out, (x, res, w)


def _wl_lnc_bwd(mask_tail, interpret, saved, ct):
  x, res, w = saved
  if res is None:
    _, vjp = jax.vjp(
        lambda x_, w_: attn_pool_wlogits_lnc_reference(
            x_, w_, mask_tail), x, w)
    gx, gw = vjp(ct)
    return gx, None, gw
  _, vjp = jax.vjp(
      lambda x_, r_, w_: attn_pool_wlogits_lnc_reference(
          x_, w_, mask_tail, r_), x, res, w)
  return vjp(ct)


_wl_lnc_core.defvjp(_wl_lnc_fwd, _wl_lnc_bwd)


def attn_pool_wlogits_lnc(x: Array, w: Array, mask_tail: bool,
                          residual: Array | None = None,
                          use_pallas: bool | None = None) -> Array:
  """LNC dispatcher; x (L, N, C), L even."""
  l, n, c = x.shape
  if use_pallas is None:
    use_pallas = use_pallas_attn_pool()
  has_res = residual is not None
  ok = (l % 2 == 0 and c % 128 == 0
        and _pick_tile_n_lnc(n, l, c, has_res=has_res) > 0)
  if use_pallas and ok:
    return _wl_lnc_core(x, residual, w, mask_tail, False)
  return attn_pool_wlogits_lnc_reference(x, w, mask_tail, residual)


def pool_prologue_im2col_wlogits_lnc_reference(
    x: Array, w: Array, scale: Array, shift: Array, k_taps: int,
    act: str | None, mask_tail: bool, residual: Array | None = None,
    pad_out: bool = False) -> Array:
  pooled = attn_pool_wlogits_lnc_reference(x, w, mask_tail, residual)
  xg = _act(act, pooled.astype(jnp.float32)
            * scale[None, None, :] + shift[None, None, :]
            ).astype(x.dtype)
  lh, n, c = xg.shape
  slabs = []
  for off in _live_offsets(k_taps, lh):
    if off >= 0:
      seg = jnp.pad(xg[off:], ((0, off), (0, 0), (0, 0)))
    else:
      seg = jnp.pad(xg[:lh + off], ((-off, 0), (0, 0), (0, 0)))
    slabs.append(seg)
  cols = jnp.concatenate(slabs, axis=-1)
  if pad_out:
    cols = jnp.pad(cols, ((0, 1), (0, 0), (0, 0)))
  return cols


def _wl_mega_kernel_lnc(x_ref, *rest, offsets, act, mask_tail,
                        has_res, pad_out):
  if has_res:
    res_ref, w_ref, s_ref, t_ref, o_ref = rest
  else:
    w_ref, s_ref, t_ref, o_ref = rest
  x = x_ref[:]
  if has_res:
    x = x + res_ref[:]
  l = x.shape[0]
  lh = l // 2
  c = x.shape[-1]
  pooled = _pool_wlogits_blend_lnc(x, w_ref, mask_tail=mask_tail)
  xg = _act(act, pooled * s_ref[0][None, None, :]
            + t_ref[0][None, None, :]).astype(x.dtype)
  tn = x.shape[1]
  for j, off in enumerate(offsets):
    lane = slice(j * c, (j + 1) * c)
    if off >= 0:
      o_ref[:lh - off, :, lane] = xg[off:]
      if off:
        o_ref[lh - off:lh, :, lane] = jnp.zeros((off, tn, c), xg.dtype)
    else:
      o_ref[-off:lh, :, lane] = xg[:lh + off]
      o_ref[:-off, :, lane] = jnp.zeros((-off, tn, c), xg.dtype)
  if pad_out:
    o_ref[lh:lh + 1] = jnp.zeros((1, tn, len(offsets) * c), xg.dtype)


@functools.partial(jax.jit, static_argnames=('k_taps', 'act',
                                             'mask_tail', 'pad_out',
                                             'interpret'))
def pool_prologue_im2col_wlogits_lnc_pallas(
    x: Array, w: Array, scale: Array, shift: Array, k_taps: int,
    act: str | None, mask_tail: bool, residual: Array | None = None,
    pad_out: bool = False, interpret: bool = False) -> Array:
  """LNC mega kernel: pool blend + next block's BN affine + act +
  im2col emission in one VMEM pass; x (L, N, C), L even. Output
  (LH(+1), N, k_live*C), ready for ONE stacked conv matmul."""
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  l, n, c = x.shape
  lh = l // 2
  lh_out = lh + (1 if pad_out else 0)
  offsets = tuple(_live_offsets(k_taps, lh))
  k_live = len(offsets)
  has_res = residual is not None
  tile_n = _pick_tile_n_lnc(n, l, c, k_live=k_live, has_res=has_res)
  body = functools.partial(_wl_mega_kernel_lnc, offsets=offsets,
                           act=act, mask_tail=mask_tail,
                           has_res=has_res, pad_out=pad_out)
  xspec = pl.BlockSpec((l, tile_n, c), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
  row = lambda cc: pl.BlockSpec((1, cc), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
  in_specs = [xspec] + ([xspec] if has_res else []) + [
      pl.BlockSpec((c, c), lambda i: (0, 0),
                   memory_space=pltpu.VMEM), row(c), row(c)]
  args = ((x,) + ((residual,) if has_res else ())
          + (w.astype(x.dtype),
             scale.reshape(1, c).astype(jnp.float32),
             shift.reshape(1, c).astype(jnp.float32)))
  return pl.pallas_call(
      body,
      grid=(n // tile_n,),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((lh_out, tile_n, k_live * c),
                             lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((lh_out, n, k_live * c), x.dtype),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      cost_estimate=pl.CostEstimate(
          flops=n * l * c * c // 2 + 12 * n * l * c,
          bytes_accessed=(x.size * 2 * (2 if has_res else 1)
                          + n * lh_out * k_live * c * 2),
          transcendentals=n * l * c),
      interpret=interpret,
  )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _wl_mega_lnc_core(x, res, w, scale, shift, k_taps, act, mask_tail,
                      pad_out, interpret):
  return pool_prologue_im2col_wlogits_lnc_pallas(
      x, w, scale, shift, k_taps, act, mask_tail, residual=res,
      pad_out=pad_out, interpret=interpret)


def _wl_mega_lnc_fwd(x, res, w, scale, shift, k_taps, act, mask_tail,
                     pad_out, interpret):
  out = pool_prologue_im2col_wlogits_lnc_pallas(
      x, w, scale, shift, k_taps, act, mask_tail, residual=res,
      pad_out=pad_out, interpret=interpret)
  return out, (x, res, w, scale, shift)


def _wl_mega_lnc_bwd(k_taps, act, mask_tail, pad_out, interpret,
                     saved, ct):
  x, res, w, scale, shift = saved
  if res is None:
    _, vjp = jax.vjp(
        lambda x_, w_, s_, t_: pool_prologue_im2col_wlogits_lnc_reference(
            x_, w_, s_, t_, k_taps, act, mask_tail, pad_out=pad_out),
        x, w, scale, shift)
    gx, gw, gs, gt = vjp(ct)
    return gx, None, gw, gs, gt
  _, vjp = jax.vjp(
      lambda x_, r_, w_, s_, t_:
      pool_prologue_im2col_wlogits_lnc_reference(
          x_, w_, s_, t_, k_taps, act, mask_tail, r_, pad_out=pad_out),
      x, res, w, scale, shift)
  return vjp(ct)


_wl_mega_lnc_core.defvjp(_wl_mega_lnc_fwd, _wl_mega_lnc_bwd)


def pool_prologue_im2col_wlogits_lnc(
    x: Array, w: Array, scale: Array, shift: Array, k_taps: int,
    act: str | None, mask_tail: bool, residual: Array | None = None,
    pad_out: bool = False, use_pallas: bool | None = None) -> Array:
  """LNC dispatcher; x (L, N, C), L even."""
  l, n, c = x.shape
  if use_pallas is None:
    use_pallas = use_pallas_attn_pool()
  k_live = len(_live_offsets(k_taps, l // 2))
  has_res = residual is not None
  ok = (l % 2 == 0 and c % 128 == 0
        and _pick_tile_n_lnc(n, l, c, k_live=k_live,
                             has_res=has_res) > 0)
  if use_pallas and ok:
    return _wl_mega_lnc_core(x, residual, w, scale, shift, k_taps,
                             act, mask_tail, pad_out, False)
  return pool_prologue_im2col_wlogits_lnc_reference(
      x, w, scale, shift, k_taps, act, mask_tail, residual,
      pad_out=pad_out)
