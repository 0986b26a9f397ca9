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

import flax.linen as nn
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
  """
  k_taps, _, c_out = kernel.shape
  b, l, _ = x.shape
  half = (k_taps - 1) // 2 * dilation
  out = None
  for k in range(k_taps):
    off = k * dilation - half
    if off <= -l or off >= l:
      continue   # tap entirely in zero padding
    if off >= 0:
      seg = x[:, off:, :]
      pad = ((0, 0), (0, off), (0, 0))
    else:
      seg = x[:, :l + off, :]
      pad = ((0, 0), (-off, 0), (0, 0))
    tap = jnp.dot(seg, kernel[k],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    if off:
      tap = jnp.pad(tap, pad)
    out = tap if out is None else out + tap
  if out is None:
    out = jnp.zeros(x.shape[:-1] + (c_out,), x.dtype)
  if bias is not None:
    out = out + bias
  return out


class Conv1D(nn.Module):
  """Drop-in for flax nn.Conv(features, (k,), kernel_dilation=(d,),
  padding='SAME') with identical parameter shapes/names."""
  features: int
  kernel_size: int
  dilation: int = 1
  use_bias: bool = True
  dtype: jnp.dtype | None = None

  @nn.compact
  def __call__(self, x: Array) -> Array:
    dtype = self.dtype or x.dtype
    kernel = self.param(
        'kernel', nn.initializers.lecun_normal(),
        (self.kernel_size, x.shape[-1], self.features))
    bias = (self.param('bias', nn.initializers.zeros,
                       (self.features,)) if self.use_bias else None)
    x = x.astype(dtype)
    return conv1d_shifted(
        x, kernel.astype(dtype),
        None if bias is None else bias.astype(dtype),
        self.dilation)
