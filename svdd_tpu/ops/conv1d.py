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
  """SAME-padded conv1d; x (B, L, Cin), kernel (K, Cin, Cout)."""
  k_taps, _, c_out = kernel.shape
  b, l, _ = x.shape
  half = (k_taps - 1) // 2 * dilation
  # one zero-padded buffer; every tap is a static slice of it
  xp = jnp.pad(x, ((0, 0), (half, half), (0, 0)))
  # f32 MXU accumulation per tap (bf16 preferred_element_type crashed
  # the TPU worker via the remote backend), downcast fused into the
  # tap epilogue so inter-tap sums stay in the input dtype
  out = None
  for k in range(k_taps):
    start = k * dilation
    tap = jnp.dot(xp[:, start:start + l, :], kernel[k],
                  preferred_element_type=jnp.float32).astype(x.dtype)
    out = tap if out is None else out + tap
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
