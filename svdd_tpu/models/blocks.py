"""Shared value/reward-net building blocks.

Flax rebuilds of the reference's grelu-style layer library
(/root/reference/Enformer.py:2050-2660: ConvBlock with "CDNRA"/"NACDR"
op-order strings, LinearBlock, FeedForwardBlock, Stem, Pool, AdaptivePool,
Norm, ChannelTransform, Crop, Activation incl. gelu_enformer).

All blocks use channel-LAST (B, L, C) layout — the TPU-friendly layout
where 1-D convs lower to MXU matmuls — whereas the reference is
channel-first (N, C, L) with transpose shims. BatchNorm uses flax's
'batch_stats' collection: frozen running stats at decode (eval mode),
mutable during training (SURVEY.md §7.3 hard-parts list).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from svdd_tpu.ops.conv1d import Conv1D

Array = jnp.ndarray


class FastLayerNorm(nn.LayerNorm):
  """nn.LayerNorm whose elementwise apply runs in the input dtype.

  flax's LayerNorm promotes the whole normalize chain to f32 and casts
  only the final result (normalization._normalize), so under a bf16
  trunk the sub/mul/mul/add ops fuse into the following dot's operand
  read as f32 work — measured to throttle the MXU ~11% on the 1x1-conv
  dots (scripts/probe_1x1_operand.py, TODO.md r2-late). Here the
  mean/rsqrt stats stay f32, but mean/rstd/scale/bias are cast to the
  input dtype BEFORE the apply, so the chain XLA fuses into the qkv /
  FFN dot operands is all-bf16. Param tree ('scale'/'bias') and the
  f32 input path are identical to nn.LayerNorm; only bf16 inputs with
  the default last-axis reduction take the fast path.
  """

  @nn.compact
  def __call__(self, x, *, mask=None):
    assert (mask is None and self.reduction_axes == -1
            and self.feature_axes == -1 and self.axis_name is None), (
        'FastLayerNorm only supports the default last-axis config')
    features = x.shape[-1]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    if self.use_fast_variance:
      var = jnp.maximum(
          jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
          - jnp.square(mean), 0.0)
    else:
      var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + self.epsilon)
    scale = (self.param('scale', self.scale_init, (features,),
                        self.param_dtype)
             if self.use_scale else None)
    bias = (self.param('bias', self.bias_init, (features,),
                       self.param_dtype)
            if self.use_bias else None)
    if x.dtype == jnp.bfloat16:
      # bf16 apply: all ops XLA fuses into the next dot's operand
      # read are bf16 (stats above stay f32)
      y = (x - mean.astype(x.dtype)) * rstd.astype(x.dtype)
      if scale is not None:
        y = y * scale.astype(x.dtype)
      if bias is not None:
        y = y + bias.astype(x.dtype)
      return y
    # f32/other dtypes: flax's exact op order (normalization._normalize)
    y = x32 - mean
    mul = rstd
    if scale is not None:
      mul = mul * scale.astype(jnp.float32)
    y = y * mul
    if bias is not None:
      y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


class PendingBias(NamedTuple):
  """A conv output whose channel bias has NOT been added yet.

  Used by the NACDR eval pipeline so raw matmul outputs can feed
  Pallas custom calls directly: XLA can't fuse a bias add into a
  custom-call operand read, so a biased copy would otherwise
  materialize (measured ~14 ms/step, trace r2-b512). Constant channel
  biases cancel inside the pairwise attention-pool blend
  (logits difference (x0-x1)@W and d = x1-x0 are bias-invariant) and
  pass through it additively, so the pending bias folds into the next
  block's norm-affine shift, or is re-applied on fallback paths.

  ``lnc=True`` marks the L-major pipeline: x is (L, N, C) — the
  logical layout whose default physical layout matches what XLA's dot
  emits, so kernel boundaries need no relayout copies (see
  ops/attn_pool_pallas.py LNC section). ``tail_pad`` marks that the
  last L-slab is a zero/junk pad row emitted by the producer
  (pad_out) and must be masked by the next pool's tail blend."""
  x: Array
  bias: Array           # (C,) f32
  tail_pad: bool = False
  lnc: bool = False


class PoolHandoff(NamedTuple):
  """Deferred attention-pool handoff consumed by the next k>1 NACDR
  ConvBlock's fused pool+prologue+im2col mega kernel."""
  x: Array                      # pre-pool input (even L)
  w: Array                      # (C, C) logits weight
  mask_tail: bool               # tail pair's second slot is pad/junk
  residual: Optional[Array]     # rides inside the kernel
  out_bias: Optional[Array]     # deferred producer bias, (C,) f32
  lnc: bool = False             # x/residual are (L, N, C)


_FORCE_UNFUSED = 0    # unfused_guard depth (trace-time, not traced)


def use_fused_nacdr() -> bool:
  """Kill-switch for the fused NACDR conv path (SVDD_FUSED_NACDR=0)."""
  import os
  if _FORCE_UNFUSED:
    return False
  return os.environ.get('SVDD_FUSED_NACDR', '1') == '1'


import contextlib  # noqa: E402


@contextlib.contextmanager
def unfused_guard():
  """Trace the enclosed region with the fused NACDR eval pipeline OFF.

  Used around jax.grad through a value/reward trunk (DPS and
  classifier guidance, sampling/guidance.py): the fused eval kernels'
  custom VJPs re-run the UNFUSED reference forward to linearize, so a
  grad context through the fused pipeline pays fused-fwd + reference-
  fwd + XLA backward chains. Tracing the grad region unfused instead
  runs one XLA forward whose convs/pools carry the fused Pallas
  backwards (ops/conv1d_bwd_pallas.py,
  ops/attn_pool_pallas.attn_pool_wlogits_bwd_pallas) — strictly less
  work. Trace-time only; the flag never enters the jaxpr."""
  global _FORCE_UNFUSED
  _FORCE_UNFUSED += 1
  try:
    yield
  finally:
    _FORCE_UNFUSED -= 1


def gelu_enformer(x: Array) -> Array:
  """Enformer's sigmoid-approx GELU: x * sigmoid(1.702 x)
  (enformer_pytorch GELU, imported at Enformer.py:8)."""
  return x * jax.nn.sigmoid(1.702 * x)


def activation(name: Optional[str], x: Array) -> Array:
  """Activation registry (Enformer.py:2371-2410)."""
  if name is None:
    return x
  if name == 'relu':
    return jax.nn.relu(x)
  if name == 'elu':
    return jax.nn.elu(x)
  if name == 'gelu':
    return jax.nn.gelu(x, approximate=False)
  if name == 'gelu_enformer':
    return gelu_enformer(x)
  if name == 'softplus':
    return jax.nn.softplus(x)
  if name == 'exp':
    return jnp.exp(x)
  raise NotImplementedError(name)


class Norm(nn.Module):
  """'batch' / 'layer' / None normalization over the channel axis
  (Enformer.py:2504-2558). Input (B, L, C)."""
  func: Optional[str]
  momentum: float = 0.9
  epsilon: float = 1e-5

  @nn.compact
  def __call__(self, x: Array, train: bool = False) -> Array:
    if self.func is None:
      return x
    if self.func == 'layer':
      return FastLayerNorm(epsilon=self.epsilon, dtype=x.dtype,
                           name='LayerNorm_0')(x)
    if self.func == 'batch':
      return nn.BatchNorm(
          use_running_average=not train, momentum=self.momentum,
          epsilon=self.epsilon, dtype=x.dtype)(x)
    raise NotImplementedError(self.func)


class AttentionPool(nn.Module):
  """Enformer attention pooling over groups of ``pool_size`` positions
  (enformer_pytorch AttentionPool, used via Pool('attn'),
  Enformer.py:2416-2460). Logits come from a dim->dim linear initialized
  at 2*identity; odd-length tails are -inf masked."""
  dim: int
  pool_size: int = 2

  @nn.compact
  def __call__(self, x: Array, defer: bool = False,
               residual: Array | None = None,
               out_bias: Array | None = None,
               lnc: bool = False,
               tail_pad: bool = False):   # (B, L, C) / lnc: (L, B, C)
    b, n, c = x.shape
    p = self.pool_size
    if lnc:
      # L-major pipeline: x (L, N, C) with L ALREADY even (producers
      # emit a pad slab, pad_out); the tail-pair mask comes from the
      # caller instead of the shape. Kernel dispatchers fall back to
      # transposed jnp references off-TPU / on unsupported shapes.
      assert p == 2 and x.shape[0] % 2 == 0
      from svdd_tpu.ops import attn_pool_pallas as app
      w_cast = self.param(
          'to_attn_logits',
          lambda key, shape: 2.0 * jnp.eye(shape[0], dtype=jnp.float32),
          (c, c)).astype(x.dtype)
      if defer:
        return PoolHandoff(x, w_cast, tail_pad, residual, out_bias,
                           lnc=True)
      out = app.attn_pool_wlogits_lnc(x, w_cast, tail_pad,
                                      residual=residual)
      if out_bias is not None:
        out = out + out_bias.astype(out.dtype)
      return out                      # (L/2, N, C), still L-major
    remainder = n % p
    pad = (p - remainder) % p
    logits_w = self.param(
        'to_attn_logits',
        lambda key, shape: 2.0 * jnp.eye(shape[0], dtype=jnp.float32),
        (c, c))
    if p == 2:
      from svdd_tpu.ops import attn_pool_pallas as app
      if app.wlogits_pool_ok(n + pad, c):
        # w-logits path: NO XLA logits matmul — the kernel computes
        # l0-l1 = (x0-x1) @ W in-VMEM (half the FLOPs, hidden under
        # the kernel's DMA; kills the relayout copy + -inf pad the
        # materialized logits needed). Odd L: zero-pad x, the kernel
        # forces the tail pair's blend weight to 1 (same selection the
        # -inf logits pad produced, Enformer.py:2447-2452). The
        # ConvBlock's trailing residual add rides in-kernel too (the
        # summed array never hits HBM). ``out_bias`` is the deferred
        # producer bias, additive on the pool output: bias-invariant
        # inside the blend, so it folds into the consumer's affine
        # shift (deferred handoff) or one fused XLA add (last pool).
        if pad:
          x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
          if residual is not None:
            residual = jnp.pad(residual, ((0, 0), (0, pad), (0, 0)))
        w_cast = logits_w.astype(x.dtype)
        if defer:
          # deferred-pool handoff: the consumer (the next k=5 NACDR
          # ConvBlock) runs the fused pool+prologue+im2col mega kernel
          # (ops/attn_pool_pallas.pool_prologue_im2col_wlogits) so the
          # pooled array never hits HBM
          return PoolHandoff(x, w_cast, bool(pad), residual, out_bias)
        out = app.attn_pool_wlogits(x, w_cast, bool(pad),
                                    residual=residual)
        if out_bias is not None:
          # fuses into the consumer's read of the kernel output
          out = out + out_bias.astype(out.dtype)
        return out
    if residual is not None:     # legacy paths apply the add up front
      x = x + residual
    if out_bias is not None:
      x = x + out_bias.astype(x.dtype)
    # matmul on the FLAT (B, L, C) layout, then group — grouping first
    # forced an awkward (B, L/2, 2, C) operand layout on TPU
    logits = jnp.dot(x, logits_w.astype(x.dtype),
                     preferred_element_type=jnp.float32
                     ).astype(x.dtype)
    if pad:
      x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
      logits = jnp.pad(logits, ((0, 0), (0, pad), (0, 0)),
                       constant_values=jnp.finfo(x.dtype).min)
    if defer and p == 2:
      # legacy deferred handoff (non-128-aligned C): materialized
      # logits feed pool_prologue_im2col
      return x, logits
    if p == 2:
      # fused softmax-sum kernel: one VMEM pass over x+logits instead
      # of XLA's three bandwidth-bound passes (~35 ms/step of the
      # B=512 guided decode, trace r2-b512). In-kernel the pairwise
      # softmax is a sigmoid blend over a (B, L/2, 2C) lane-split view
      # (ops/attn_pool_pallas.py; the earlier XLA-level ::2 strided
      # rewrite that measured 28% slower is unrelated — Pallas controls
      # the layout so no relayouts happen).
      from svdd_tpu.ops.attn_pool_pallas import attn_pool_fused
      return attn_pool_fused(x, logits)
    xg = x.reshape(b, -1, p, c)
    lg = logits.reshape(b, -1, p, c)
    attn = jax.nn.softmax(lg, axis=2)
    return (xg * attn).sum(axis=2)


class Pool(nn.Module):
  """'avg' / 'max' / 'attn' / None pooling (Enformer.py:2416-2460)."""
  func: Optional[str]
  pool_size: Optional[int] = None
  in_channels: Optional[int] = None

  @nn.compact
  def __call__(self, x: Array, defer: bool = False,
               residual: Array | None = None,
               out_bias: Array | None = None,
               lnc: bool = False,
               tail_pad: bool = False):
    if self.func is None:
      assert residual is None and out_bias is None
      return x
    p = self.pool_size
    if self.func == 'avg':
      assert residual is None and out_bias is None
      return nn.avg_pool(x, (p,), strides=(p,))
    if self.func == 'max':
      assert residual is None and out_bias is None
      return nn.max_pool(x, (p,), strides=(p,))
    if self.func == 'attn':
      return AttentionPool(dim=self.in_channels, pool_size=p)(
          x, defer=defer, residual=residual, out_bias=out_bias,
          lnc=lnc, tail_pad=tail_pad)
    raise NotImplementedError(self.func)


def adaptive_pool(func: Optional[str], x: Array) -> Array:
  """Pool the whole length axis (Enformer.py:2463-2501). (B,L,C)->(B,C)."""
  if func is None:
    return x
  if func == 'avg':
    return x.mean(axis=1)
  if func == 'max':
    return x.max(axis=1)
  raise NotImplementedError(func)


class ChannelTransform(nn.Module):
  """1x1 conv channel resize; identity when channels already match
  (Enformer.py:2561-2593)."""
  in_channels: int
  out_channels: int
  if_equal: bool = False

  @nn.compact
  def __call__(self, x: Array) -> Array:
    if self.in_channels == self.out_channels and not self.if_equal:
      return x
    return Conv1D(self.out_channels, 1, dtype=x.dtype)(x)


class ConvBlock(nn.Module):
  """Conv + {norm, dropout, residual, activation} in configurable order,
  pooling always last (Enformer.py:2176-2292).

  order: permutation of "CDNRA" — Conv, Dropout, Norm, Residual, Act.
  """
  in_channels: int
  out_channels: int
  kernel_size: int
  dilation: int = 1
  act_func: Optional[str] = 'relu'
  pool_func: Optional[str] = None
  pool_size: Optional[int] = None
  dropout: float = 0.0
  norm: bool = True
  residual: bool = False
  order: str = 'CDNRA'

  @nn.compact
  def __call__(self, x, train: bool = False,
               defer_pool: bool = False):
    assert sorted(self.order) == list('ACDNR'), self.order
    pending = isinstance(x, PendingBias)   # raw conv out + channel bias
    deferred = isinstance(x, tuple) and not pending   # attn-pool handoff
    x_dtype = (x.x.dtype if pending
               else x[0].dtype if deferred else x.dtype)
    lnc = (x.lnc if isinstance(x, (PendingBias, PoolHandoff))
           else False)
    norm = Norm('batch' if self.norm else None)
    conv = Conv1D(self.out_channels, self.kernel_size,
                  dilation=self.dilation, dtype=x_dtype)
    drop = nn.Dropout(self.dropout, deterministic=not train)

    # NACDR eval fast path: norm -> act -> conv collapses into the
    # fused Pallas conv (ops/fused_conv_pallas.py). Eval BatchNorm is
    # per-channel affine; recover (scale, shift) EXACTLY by probing the
    # norm module with 0/1 inputs (keeps the param tree untouched).
    fast = (use_fused_nacdr() and self.order == 'NACDR' and self.norm
            and not train and self.dilation == 1)
    if fast and (self.kernel_size > 1 or pending):
      c_in = (x.x.shape[-1] if pending
              else x[0].shape[-1] if deferred else x.shape[-1])
      probe = jnp.concatenate(
          [jnp.zeros((1, 1, c_in), jnp.float32),
           jnp.ones((1, 1, c_in), jnp.float32)], axis=1)
      bn = norm(probe, train=False)
      shift, scale = bn[0, 0], bn[0, 1] - bn[0, 0]
      shift = shift.astype(jnp.float32)
      scale = scale.astype(jnp.float32)
      if pending:
        # pool-block branch (k=1): the producer's bias folds into the
        # norm-affine shift; the 1x1 conv runs on the RAW input so its
        # matmul output can feed the attention-pool kernel with no
        # bias-materialization pass. norm(y_raw + b) =
        # y_raw*scale + (shift + b*scale).
        assert self.kernel_size == 1
        y_raw, b_in, tail_pad, _ = x
        shift = shift + b_in * scale
        # affine+act in the INPUT dtype: this chain fuses into the 1x1
        # conv dot's operand read, and an f32 round-trip there throttles
        # the MXU feed (measured: bf16 gelu on the operand is FREE,
        # 95.8 vs 95.7 TF/s; f32 gelu+affine costs 11% —
        # scripts/probe_1x1_operand.py). f32 inputs keep f32 math.
        t = activation(self.act_func,
                       y_raw * scale.astype(x_dtype)
                       + shift.astype(x_dtype)).astype(x_dtype)
        z_raw, b_c = conv(t, defer_bias=True)
        if self.residual:
          assert self.in_channels == self.out_channels, (
              'pending-bias pipeline needs an identity residual')
          out_bias = b_c + b_in
          if self.pool_func == 'attn' and self._defer_residual():
            return Pool(self.pool_func, self.pool_size,
                        in_channels=self.out_channels)(
                            z_raw, defer=defer_pool, residual=y_raw,
                            out_bias=out_bias, lnc=lnc,
                            tail_pad=tail_pad)
          z = (z_raw + y_raw
               + out_bias.astype(x_dtype))    # D is inert at eval
        else:
          z = z_raw + b_c.astype(x_dtype)
        assert not lnc, 'LNC pipeline requires the attn-pool fast path'
        return Pool(self.pool_func, self.pool_size,
                    in_channels=self.out_channels)(z, defer=defer_pool)
      if self.residual:
        assert not deferred, ('deferred pool input + residual '
                              'unsupported')
        x_input = ChannelTransform(self.in_channels,
                                   self.out_channels)(x)
      if deferred:
        # pool blend + THIS block's BN affine + act + im2col in one
        # VMEM pass; the conv collapses to a single stacked matmul
        from svdd_tpu.ops import attn_pool_pallas as app
        assert not self.residual and self.pool_func is None
        if isinstance(x, PoolHandoff):
          # w-logits handoff: the kernel computes the residual add AND
          # the difference-logits dot; the upstream deferred bias folds
          # into this block's affine shift
          if x.out_bias is not None:
            shift = shift + x.out_bias * scale
          if x.lnc:
            # L-major: pooled length lh may be odd — emit one extra
            # zero slab (pad_out) so the downstream pool pairs an even
            # number of rows; its tail blend masks the pad.
            lh = x.x.shape[0] // 2
            pad_out = bool(lh % 2)
            cols = app.pool_prologue_im2col_wlogits_lnc(
                x.x, x.w, scale, shift, self.kernel_size,
                self.act_func, x.mask_tail, residual=x.residual,
                pad_out=pad_out)
            y_raw, b = conv(None, precols=cols, precols_len=lh,
                            defer_bias=True)
            return PendingBias(y_raw, b, tail_pad=pad_out, lnc=True)
          cols = app.pool_prologue_im2col_wlogits(
              x.x, x.w, scale, shift, self.kernel_size,
              self.act_func, x.mask_tail, residual=x.residual)
        else:
          r, logits = x
          cols = app.pool_prologue_im2col(r, logits, scale, shift,
                                          self.kernel_size,
                                          self.act_func)
        # raw output + pending bias: the downstream pool block absorbs
        # the bias, so this matmul's result feeds the next Pallas call
        # copy-free
        y_raw, b = conv(None, precols=cols, defer_bias=True)
        return PendingBias(y_raw, b)
      y = conv(x, prologue=(scale, shift, self.act_func))
      if self.residual and self._defer_residual():
        return Pool(self.pool_func, self.pool_size,
                    in_channels=self.out_channels)(
                        y, defer=defer_pool, residual=x_input)
      if self.residual:
        y = y + x_input                      # D is inert at eval
      return Pool(self.pool_func, self.pool_size,
                  in_channels=self.out_channels)(y, defer=defer_pool)

    assert not deferred and not pending, (
        'deferred/pending input requires the NACDR eval fast path')
    if self.residual:
      x_input = ChannelTransform(self.in_channels, self.out_channels)(x)
    pending_res = None
    for name in self.order:
      if name == 'C':
        x = conv(x)
      elif name == 'D':
        x = drop(x)
      elif name == 'N':
        x = norm(x, train=train)
      elif name == 'R':
        if self.residual:
          if self._defer_residual():
            # the attention pool absorbs the add (in-kernel on the
            # Pallas path; applied up front on the reference path) —
            # the summed array never materializes. Only valid when R
            # is the LAST pre-pool op, else deferral would reorder it.
            pending_res = x_input
          else:
            x = x + x_input
      elif name == 'A':
        x = activation(self.act_func, x)
    return Pool(self.pool_func, self.pool_size,
                in_channels=self.out_channels)(
                    x, defer=defer_pool, residual=pending_res)

  def _defer_residual(self) -> bool:
    """The trailing residual add can ride inside the attention-pool
    kernel only when it is the last op before the pool."""
    return (self.pool_func == 'attn' and self.pool_size == 2
            and self.order.endswith('R'))


class ChannelTransformBlock(nn.Module):
  """1x1 conv + optional norm/act/dropout in "CDNA" order
  (Enformer.py:2295-2368)."""
  in_channels: int
  out_channels: int
  norm: bool = False
  act_func: Optional[str] = 'relu'
  dropout: float = 0.0
  order: str = 'CDNA'
  if_equal: bool = False

  @nn.compact
  def __call__(self, x: Array, train: bool = False) -> Array:
    assert sorted(self.order) == list('ACDN'), self.order
    norm = Norm('batch' if self.norm else None)
    conv = ChannelTransform(self.in_channels, self.out_channels,
                            if_equal=self.if_equal)
    drop = nn.Dropout(self.dropout, deterministic=not train)
    for name in self.order:
      if name == 'C':
        x = conv(x)
      elif name == 'D':
        x = drop(x)
      elif name == 'N':
        x = norm(x, train=train)
      elif name == 'A':
        x = activation(self.act_func, x)
    return x


class LinearBlock(nn.Module):
  """Norm -> Linear -> Dropout -> Act (Enformer.py:2050-2106)."""
  in_len: int
  out_len: int
  act_func: Optional[str] = 'relu'
  dropout: float = 0.0
  norm: bool = False
  bias: bool = True

  @nn.compact
  def __call__(self, x: Array, train: bool = False) -> Array:
    x = Norm('layer' if self.norm else None)(x, train=train)
    x = nn.Dense(self.out_len, use_bias=self.bias, dtype=x.dtype)(x)
    x = nn.Dropout(self.dropout, deterministic=not train)(x)
    return activation(self.act_func, x)


class FeedForwardBlock(nn.Module):
  """2-layer FFN: in -> 2*in (norm+act) -> in (Enformer.py:2010-2047)."""
  in_len: int
  dropout: float = 0.0
  act_func: str = 'relu'

  @nn.compact
  def __call__(self, x: Array, train: bool = False) -> Array:
    x = LinearBlock(self.in_len, self.in_len * 2, norm=True,
                    dropout=self.dropout, act_func=self.act_func)(
                        x, train=train)
    x = LinearBlock(self.in_len * 2, self.in_len, norm=False,
                    dropout=self.dropout, act_func=None)(x, train=train)
    return x


class Stem(nn.Module):
  """Stem conv + act (+ optional pool); takes one-hot DNA
  (Enformer.py:1754-1804 — its layer-norm is defined but unused)."""
  in_channels: int
  out_channels: int
  kernel_size: int
  act_func: str = 'relu'
  pool_func: Optional[str] = None
  pool_size: Optional[int] = None

  @nn.compact
  def __call__(self, x: Array, train: bool = False) -> Array:
    x = Conv1D(self.out_channels, self.kernel_size, dtype=x.dtype)(x)
    x = activation(self.act_func, x)
    return Pool(self.pool_func, self.pool_size,
                in_channels=self.out_channels)(x)


class ConvHead(nn.Module):
  """1x1-conv channel head + adaptive pool (Enformer.py:2131-2173).
  (B, L, C) -> (B, n_tasks)."""
  n_tasks: int
  in_channels: int
  act_func: Optional[str] = None
  pool_func: Optional[str] = 'avg'
  norm: bool = False

  @nn.compact
  def __call__(self, x: Array, train: bool = False) -> Array:
    x = ChannelTransformBlock(self.in_channels, self.n_tasks,
                              act_func=self.act_func, norm=self.norm)(
                                  x, train=train)
    return adaptive_pool(self.pool_func, x)
