"""1-D convolution as shifted matmuls.

The XLA TPU conv emitter takes minutes to compile the reference CNN's
dilated convs (k=9, dilation up to 64 on L=200 — measured: a single
jitted CNN forward compiled >6 min through the axon remote compiler,
while a plain matmul compiled in 1.6 s). A k-tap conv1d is exactly

    y[l] = sum_k  x[l + (k - K//2) * dilation] @ W[k]

i.e. K shifted (B*L, Cin) x (Cin, Cout) matmuls — the MXU-native
formulation. Shifts are static pads/slices, XLA fuses the K adds, and
compile time is negligible. Param layout matches flax nn.Conv
((K, Cin, Cout) kernel, (Cout,) bias) so checkpoints interop.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def conv1d_shifted(x: Array, kernel: Array, bias: Array | None = None,
                   dilation: int = 1) -> Array:
  """SAME-padded conv1d; x (B, L, Cin), kernel (K, Cin, Cout).

  Each tap k contributes y[i] += x[i + off_k] @ W[k] with
  off_k = k*dilation - (K-1)//2*dilation. Taps whose |offset| >= L read
  only zero padding and are SKIPPED (at the reference's extreme
  dilation-64 / L=50 shapes this both saves dead matmuls and avoids a
  pad-geometry LLO compiler crash on the TPU backend); live taps slice
  the unpadded input and zero-pad their own output edge, so no pad
  ever exceeds the sequence length.

  f32 MXU accumulation per tap (bf16 preferred_element_type crashed
  the TPU worker), downcast fused into the tap epilogue so inter-tap
  sums stay in the input dtype.

  The no-bias core carries a custom VJP: on TPU its backward runs the
  fused Pallas dgrad+wgrad kernel (ops/conv1d_bwd_pallas.py) instead of
  XLA's im2col-cotangent pad/slice chains; the bias add stays outside
  so its grad is the usual fused reduction.
  """
  out = _conv_core(x, kernel, dilation)
  if bias is not None:
    out = out + bias
  return out


def _conv_impl(x: Array, kernel: Array, dilation: int = 1) -> Array:
  k_taps, c_in, c_out = kernel.shape
  b, l, _ = x.shape
  half = (k_taps - 1) // 2 * dilation

  def shifted(arr, off, fill_shape):
    if off >= 0:
      seg = arr[:, off:, :]
      pad = ((0, 0), (0, off), (0, 0))
    else:
      seg = arr[:, :l + off, :]
      pad = ((0, 0), (-off, 0), (0, 0))
    return jnp.pad(seg, pad) if off else arr

  from svdd_tpu.ops.kernel_utils import live_offsets
  live = [(off + half) // dilation
          for off in live_offsets(k_taps, l, dilation)]
  if not live:
    return jnp.zeros(x.shape[:-1] + (c_out,), x.dtype)

  # Two MXU formulations (profiled on v5e):
  #  * im2col-concat: stack the K_live shifts along channels and do ONE
  #    (B*L, K*Cin) x (K*Cin, Cout) matmul. HBM traffic = K*in + out.
  #  * tap-accumulate: K matmuls summed. Traffic = K*(in + out).
  # im2col always moves less data; it loses only when the concat buffer
  # is huge AND the op is already compute-bound. The stem convs
  # (Cin=4, K=15) were 14% of the guided step as taps — pure write
  # amplification. Cap the concat buffer at ~2 GB.
  concat_bytes = b * l * len(live) * c_in * x.dtype.itemsize
  if concat_bytes <= 2 * 2 ** 30:
    cols = jnp.concatenate(
        [shifted(x, k * dilation - half, None) for k in live], axis=-1)
    w = jnp.concatenate([kernel[k] for k in live], axis=0)
    out = jnp.dot(cols, w,
                  preferred_element_type=jnp.float32).astype(x.dtype)
  else:
    out = None
    for k in live:
      off = k * dilation - half
      tap = jnp.dot(shifted(x, off, None), kernel[k],
                    preferred_element_type=jnp.float32).astype(x.dtype)
      out = tap if out is None else out + tap
  return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_core(x, kernel, dilation):
  return _conv_impl(x, kernel, dilation)


def _conv_fwd(x, kernel, dilation):
  return _conv_impl(x, kernel, dilation), (x, kernel)


def _conv_bwd(dilation, res, ct):
  """Fused Pallas dgrad+wgrad on TPU (the Enformer value trunk, DPS /
  classifier guidance, and the oracle trainer all take jax.grad through
  these convs); XLA-differentiated reference elsewhere."""
  x, kernel = res
  from svdd_tpu.ops.conv1d_bwd_pallas import (conv1d_bwd_pallas,
                                              conv_bwd_ok,
                                              use_pallas_conv_bwd)
  n, l, c_in = x.shape
  k_taps, _, c_out = kernel.shape
  if (use_pallas_conv_bwd()
      and conv_bwd_ok(n, l, c_in, c_out, k_taps, dilation,
                      x.dtype.itemsize)):
    return conv1d_bwd_pallas(x, kernel, ct, dilation=dilation)
  _, vjp = jax.vjp(lambda a, b: _conv_impl(a, b, dilation), x, kernel)
  return vjp(ct)


_conv_core.defvjp(_conv_fwd, _conv_bwd)


def conv1d_shifted_lnc(x: Array, kernel: Array,
                       bias: Array | None = None,
                       dilation: int = 1) -> Array:
  """conv1d_shifted for L-major (L, B, Cin) inputs: shifts slice the
  LEADING dim. Used by the LNC tower pipeline (see
  ops/attn_pool_pallas.py LNC section) where the L-major logical
  layout matches the XLA dot-preferred physical layout."""
  k_taps, c_in, c_out = kernel.shape
  l = x.shape[0]
  half = (k_taps - 1) // 2 * dilation

  def shifted(arr, off):
    if off > 0:
      return jnp.pad(arr[off:], ((0, off), (0, 0), (0, 0)))
    if off < 0:
      return jnp.pad(arr[:l + off], ((-off, 0), (0, 0), (0, 0)))
    return arr

  from svdd_tpu.ops.kernel_utils import live_offsets
  live = [(off + half) // dilation
          for off in live_offsets(k_taps, l, dilation)]
  if not live:
    out = jnp.zeros(x.shape[:-1] + (c_out,), x.dtype)
    return out + bias if bias is not None else out
  cols = jnp.concatenate(
      [shifted(x, k * dilation - half) for k in live], axis=-1)
  w = jnp.concatenate([kernel[k] for k in live], axis=0)
  out = jnp.dot(cols, w,
                preferred_element_type=jnp.float32).astype(x.dtype)
  return out + bias if bias is not None else out


class Conv1D(nn.Module):
  """Drop-in for flax nn.Conv(features, (k,), kernel_dilation=(d,),
  padding='SAME') with identical parameter shapes/names.

  ``prologue=(scale, shift, act_name)`` computes
  conv(act(x*scale + shift)) through the fused Pallas kernel
  (ops/fused_conv_pallas.py) — the NACDR ConvBlock fast path that
  avoids materializing the norm/act output and the im2col buffer.
  """
  features: int
  kernel_size: int
  dilation: int = 1
  use_bias: bool = True
  dtype: jnp.dtype | None = None

  @nn.compact
  def __call__(self, x: Array, prologue: tuple | None = None,
               precols: Array | None = None,
               defer_bias: bool = False,
               precols_len: int | None = None,
               lnc: bool = False):
    """``defer_bias=True`` returns ``(raw_out, bias_f32)`` with the
    bias NOT added. Rationale (trace r2-b512): when the conv output
    feeds a Pallas custom call, XLA cannot fuse the bias add into the
    call's operand read and materializes a full biased copy
    (~14 ms/step of copy_add fusions across the value tower). The
    NACDR pipeline folds deferred biases into the next block's
    norm-affine shift instead — they cancel inside the pairwise
    attention-pool blend, see models/blocks.py."""
    if precols is not None:
      # pre-built im2col buffer (the deferred-pool mega kernel,
      # ops/attn_pool_pallas.pool_prologue_im2col): ONE stacked matmul
      dtype = self.dtype or precols.dtype
      from svdd_tpu.ops.kernel_utils import live_offsets
      half = (self.kernel_size - 1) // 2 * self.dilation
      if precols_len is not None:
        # LNC cols: the length dim is LEADING (and may carry a pad
        # slab), so the caller passes the REAL pooled length the
        # producer used for its live-offset set
        l = precols_len
      else:
        l = precols.shape[1]
      # the tap contract with the im2col producers lives in ONE place
      # (kernel_utils.live_offsets) so the stacked-weight column order
      # can never desynchronize from the producers' slab order
      live = [(off + half) // self.dilation
              for off in live_offsets(self.kernel_size, l,
                                      self.dilation)]
      c_in = precols.shape[-1] // len(live)
      kernel = self.param(
          'kernel', nn.initializers.lecun_normal(),
          (self.kernel_size, c_in, self.features))
      w = jnp.concatenate([kernel[k] for k in live], axis=0)
      out = jnp.dot(precols, w.astype(dtype),
                    preferred_element_type=jnp.float32).astype(dtype)
      if self.use_bias:
        bias = self.param('bias', nn.initializers.zeros,
                          (self.features,))
        if defer_bias:
          return out, bias.astype(jnp.float32)
        out = out + bias.astype(dtype)
      elif defer_bias:
        return out, jnp.zeros((self.features,), jnp.float32)
      return out
    dtype = self.dtype or x.dtype
    kernel = self.param(
        'kernel', nn.initializers.lecun_normal(),
        (self.kernel_size, x.shape[-1], self.features))
    bias = (self.param('bias', nn.initializers.zeros,
                       (self.features,)) if self.use_bias else None)
    x = x.astype(dtype)
    if defer_bias:
      shift_fn = conv1d_shifted_lnc if lnc else conv1d_shifted
      raw = shift_fn(x, kernel.astype(dtype), None, self.dilation)
      b = (bias.astype(jnp.float32) if bias is not None
           else jnp.zeros((self.features,), jnp.float32))
      return raw, b
    if prologue is not None:
      assert self.dilation == 1 and bias is not None
      scale, shift, act_name = prologue
      from svdd_tpu.ops.fused_conv_pallas import (fused_conv1d,
                                                  use_pallas_fused_conv)
      from svdd_tpu.ops.im2col_pallas import (nacdr_conv1d,
                                              use_pallas_im2col)
      if use_pallas_im2col() and not use_pallas_fused_conv():
        # fused prologue+im2col kernel + ONE XLA matmul (the winning
        # split: dots at XLA's ~190 TFLOP/s, everything between dots
        # in VMEM — see ops/im2col_pallas.py)
        return nacdr_conv1d(x, kernel.astype(dtype),
                            bias.astype(dtype), scale, shift,
                            act=act_name)
      return fused_conv1d(x, kernel.astype(dtype), bias.astype(dtype),
                          scale, shift, act=act_name)
    return conv1d_shifted(
        x, kernel.astype(dtype),
        None if bias is None else bias.astype(dtype),
        self.dilation)
