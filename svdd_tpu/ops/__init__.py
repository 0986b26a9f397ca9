"""TPU compute kernels: Pallas implementations of the reference's native
(CUDA/Triton) dependencies, with XLA fallbacks for CPU tests.

Mapping (SURVEY.md §2.1):
  flash-attn CUDA        -> ops.attention (Pallas flash attention / XLA)
  mamba-ssm CUDA         -> ops.scan (associative selective scan)
  causal-conv1d CUDA     -> fused into ops.scan / lax.conv
  Triton layer/RMS norm  -> ops.norms (fused add+RMSNorm)
  TorchScript fused ops  -> plain jnp (XLA fuses automatically)
"""
