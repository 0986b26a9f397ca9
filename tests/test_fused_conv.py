"""Fused BN+act+conv Pallas kernel: interpret-mode vs reference, and
the ConvBlock NACDR fast path vs the unfused op sequence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _rand(key, shape, scale=1.0):
  return scale * jax.random.normal(jax.random.key(key), shape,
                                   jnp.float32)


@pytest.mark.parametrize('n,l,cin,cout,k', [
    (16, 25, 128, 256, 5),
    (8, 13, 256, 128, 5),
    (8, 4, 128, 128, 3),
])
def test_fused_conv_pallas_interpret_matches_reference(n, l, cin, cout, k):
  from svdd_tpu.ops.fused_conv_pallas import (fused_conv1d_pallas,
                                              fused_conv1d_reference)
  x = _rand(0, (n, l, cin))
  w = _rand(1, (k, cin, cout), 0.05)
  b = _rand(2, (cout,), 0.1)
  scale = 1.0 + 0.1 * _rand(3, (cin,))
  shift = 0.1 * _rand(4, (cin,))
  ref = fused_conv1d_reference(x, w, b, scale, shift)
  out = fused_conv1d_pallas(x, w, b, scale, shift, interpret=True)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             atol=1e-4, rtol=1e-4)


def test_convblock_nacdr_fast_path_matches_unfused():
  """The NACDR eval fast path (BN probe -> fused conv) must equal the
  op-by-op path bit-for-bit at fp32 tolerance."""
  from svdd_tpu.models import blocks

  kwargs = dict(in_channels=128, out_channels=128, kernel_size=5,
                act_func='gelu_enformer', residual=True, order='NACDR',
                pool_func='attn', pool_size=2)
  block = blocks.ConvBlock(**kwargs)
  x = _rand(5, (4, 20, 128))
  variables = block.init(jax.random.key(0), x)
  # randomize batch stats so the affine is non-trivial
  variables = jax.tree.map(lambda a: a, variables)
  bs = variables['batch_stats']
  leaf = list(jax.tree_util.tree_leaves_with_path(bs))
  import flax
  bs = flax.core.unfreeze(bs)
  bs['Norm_0']['BatchNorm_0']['mean'] = 0.2 * _rand(6, (128,))
  bs['Norm_0']['BatchNorm_0']['var'] = 1.0 + 0.3 * jnp.abs(_rand(7, (128,)))
  variables = {'params': variables['params'], 'batch_stats': bs}

  fast = block.apply(variables, x)

  # unfused: flip the kill-switch and re-run the SAME block/params
  import os
  os.environ['SVDD_FUSED_NACDR'] = '0'
  try:
    slow = block.apply(variables, x)
  finally:
    os.environ.pop('SVDD_FUSED_NACDR')
  np.testing.assert_allclose(np.asarray(fast), np.asarray(slow),
                             atol=2e-5, rtol=1e-5)
