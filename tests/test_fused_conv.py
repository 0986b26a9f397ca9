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


@pytest.mark.parametrize('dilation', [1, 4, 16, 64])
def test_cnn_layer_pallas_interpret_matches_reference(dilation):
  """Fused denoiser layer (bias+LN+dilated conv+relu+residual) in
  interpret mode vs the jnp reference, incl. dead-tap dilations."""
  from svdd_tpu.ops.cnn_layer_pallas import (cnn_layer_pallas,
                                             cnn_layer_reference)
  n, l, c, k = 8, 50, 128, 9
  x = _rand(0, (n, l, c))
  br = _rand(1, (n, c), 0.5)
  g = 1.0 + 0.1 * _rand(2, (c,))
  b = 0.1 * _rand(3, (c,))
  w = _rand(4, (k, c, c), 0.05)
  cb = 0.1 * _rand(5, (c,))
  ref = cnn_layer_reference(x, br, g, b, w, cb, dilation)
  out = cnn_layer_pallas(x, br, g, b, w, cb, dilation=dilation,
                         interpret=True)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             atol=1e-4, rtol=1e-4)


def test_cnn_layer_reference_matches_module_semantics():
  """cnn_layer_reference == the historical per-op CNN layer body
  (bias add -> LayerNorm(eps 1e-6) -> dilated conv -> relu -> +x)."""
  import flax.linen as nn
  from svdd_tpu.ops.cnn_layer_pallas import cnn_layer_reference
  from svdd_tpu.ops.conv1d import conv1d_shifted
  n, l, c, k, dil = 4, 30, 128, 9, 4
  x = _rand(0, (n, l, c))
  br = _rand(1, (n, c), 0.5)
  g = 1.0 + 0.1 * _rand(2, (c,))
  b = 0.1 * _rand(3, (c,))
  w = _rand(4, (k, c, c), 0.05)
  cb = 0.1 * _rand(5, (c,))
  h = x + br[:, None, :]
  ln = nn.LayerNorm(use_fast_variance=False)
  h = ln.apply({'params': {'scale': g, 'bias': b}}, h)
  want = jax.nn.relu(conv1d_shifted(h, w, cb, dil)) + x
  got = cnn_layer_reference(x, br, g, b, w, cb, dil)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=1e-5, rtol=1e-5)


def test_cnn_layer_fused_custom_vjp_matches_reference_grad():
  """DPS/classifier guidance backprop through the denoiser: the fused
  kernel's custom VJP must equal the reference gradient."""
  from svdd_tpu.ops.cnn_layer_pallas import (_fused_core,
                                             cnn_layer_reference)
  n, l, c, k, dil = 8, 20, 128, 9, 4
  x = _rand(0, (n, l, c))
  br = _rand(1, (n, c), 0.5)
  g = 1.0 + 0.1 * _rand(2, (c,))
  b = 0.1 * _rand(3, (c,))
  w = _rand(4, (k, c, c), 0.05)
  cb = 0.1 * _rand(5, (c,))
  probe = _rand(6, (n, l, c))

  def loss_fused(x, w):
    return jnp.sum(_fused_core(x, br, g, b, w, cb, dil, 1e-6, True)
                   * probe)

  def loss_ref(x, w):
    return jnp.sum(cnn_layer_reference(x, br, g, b, w, cb, dil) * probe)

  gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w)
  gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
  np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                             atol=1e-4, rtol=1e-4)
  np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                             atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize('dilation', [1, 4, 16, 64])
def test_cnn_layer_bwd_pallas_matches_reference_vjp(dilation):
  """The fused Pallas backward kernel (forward-recompute relu mask +
  mirror-dot dgrad + transposed-dot wgrad + LN backward) vs
  jax.vjp through the jnp reference, all six cotangents, incl. the
  dilation-64/L=50 single-live-tap edge."""
  from svdd_tpu.ops.cnn_layer_pallas import (cnn_layer_bwd_pallas,
                                             cnn_layer_reference)
  n, l, c, k = 8, 50, 128, 9
  x = _rand(0, (n, l, c))
  br = _rand(1, (n, c), 0.5)
  g = 1.0 + 0.1 * _rand(2, (c,))
  b = 0.1 * _rand(3, (c,))
  w = _rand(4, (k, c, c), 0.05)
  cb = 0.1 * _rand(5, (c,))
  ct = _rand(6, (n, l, c))

  _, vjp = jax.vjp(
      lambda *a: cnn_layer_reference(*a, dilation=dilation),
      x, br, g, b, w, cb)
  want = vjp(ct)
  got = cnn_layer_bwd_pallas(x, br, g, b, w, cb, ct,
                             dilation=dilation, interpret=True)
  names = ('dx', 'dbias_row', 'dln_scale', 'dln_bias', 'dkernel',
           'dconv_bias')
  for nm, gt, wt in zip(names, got, want):
    assert gt.dtype == wt.dtype, nm
    np.testing.assert_allclose(np.asarray(gt), np.asarray(wt),
                               atol=2e-4, rtol=2e-4, err_msg=nm)


def test_cnn_layer_bwd_pallas_flagship_d64_split():
  """Backward twin of the d64 split test (VERDICT r4 item 5): at
  L=200/d=64 the bwd kernel's three dot groups (fwd recompute, dgrad
  mirror, wgrad contraction) run their |off|>=L/4 taps as
  restricted-row dots — all six cotangents must still match the
  reference VJP."""
  from svdd_tpu.ops.cnn_layer_pallas import (cnn_layer_bwd_pallas,
                                             cnn_layer_reference)
  n, l, c, k = 8, 200, 128, 9
  x = _rand(0, (n, l, c))
  br = _rand(1, (n, c), 0.5)
  g = 1.0 + 0.1 * _rand(2, (c,))
  b = 0.1 * _rand(3, (c,))
  w = _rand(4, (k, c, c), 0.05)
  cb = 0.1 * _rand(5, (c,))
  ct = _rand(6, (n, l, c))
  _, vjp = jax.vjp(
      lambda *a: cnn_layer_reference(*a, dilation=64),
      x, br, g, b, w, cb)
  want = vjp(ct)
  got = cnn_layer_bwd_pallas(x, br, g, b, w, cb, ct, dilation=64,
                             interpret=True)
  names = ('dx', 'dbias_row', 'dln_scale', 'dln_bias', 'dkernel',
           'dconv_bias')
  for nm, gt, wt in zip(names, got, want):
    np.testing.assert_allclose(np.asarray(gt), np.asarray(wt),
                               atol=2e-4, rtol=2e-4, err_msg=nm)


def _pallas_layer_semantics(x, br, g, b, w, cb, dil, eps=1e-6,
                            length=None):
  """jnp replica of the Pallas forward kernel's EXACT math (f32 bias
  add + f32 LN apply + per-slab bf16 cast accumulation) — the primal
  whose true VJP the Pallas backward kernel computes. The jnp
  ``cnn_layer_reference`` differs at bf16 (bf16 bias add, bf16 LN
  scale apply, single-cast im2col accumulation), so its VJP is the
  wrong oracle for bf16 backward tests."""
  from svdd_tpu.ops.cnn_layer_pallas import (_live_offsets, _live_taps)
  n, l, c = x.shape
  h0 = x.astype(jnp.float32) + br.astype(jnp.float32)[:, None, :]
  mu = h0.mean(-1, keepdims=True)
  var = ((h0 - mu) ** 2).mean(-1, keepdims=True)
  hn = (h0 - mu) * jax.lax.rsqrt(var + eps)
  h = (hn * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(
      x.dtype)
  live = _live_taps(w.shape[0], dil, l)
  offsets = _live_offsets(w.shape[0], dil, l)
  acc = jnp.zeros((n, l, c), jnp.float32)
  for k_idx, off in zip(live, offsets):
    slab = jnp.dot(h.reshape(n * l, c), w[k_idx],
                   preferred_element_type=jnp.float32)
    slab = slab.astype(x.dtype).reshape(n, l, c)
    if off > 0:
      slab = jnp.pad(slab[:, off:, :], ((0, 0), (0, off), (0, 0)))
    elif off < 0:
      slab = jnp.pad(slab[:, :l + off, :], ((0, 0), (-off, 0), (0, 0)))
    acc = acc + slab.astype(jnp.float32)
  acc = acc + cb.astype(jnp.float32)[None, None, :]
  return jnp.maximum(acc, 0.0).astype(x.dtype) + x


def test_cnn_layer_bwd_pallas_bf16():
  """bf16 activations / f32 LN+conv-bias params (the exact dtype mix
  models/cnn.py passes under SVDD_CNN_BF16): cotangent dtypes must
  match the primals and values must track the true VJP of the Pallas
  forward semantics (see _pallas_layer_semantics — the reference VJP
  is a DIFFERENT function at bf16 and diverges at relu-mask flips)."""
  from svdd_tpu.ops.cnn_layer_pallas import cnn_layer_bwd_pallas
  n, l, c, k, dil = 8, 50, 128, 9, 4
  x = _rand(0, (n, l, c)).astype(jnp.bfloat16)
  br = _rand(1, (n, c), 0.5).astype(jnp.bfloat16)
  g = 1.0 + 0.1 * _rand(2, (c,))
  b = 0.1 * _rand(3, (c,))
  w = _rand(4, (k, c, c), 0.05).astype(jnp.bfloat16)
  cb = 0.1 * _rand(5, (c,))
  ct = _rand(6, (n, l, c)).astype(jnp.bfloat16)

  _, vjp = jax.vjp(
      lambda *a: _pallas_layer_semantics(*a, dil=dil),
      x, br, g, b, w, cb)
  want = vjp(ct)
  got = cnn_layer_bwd_pallas(x, br, g, b, w, cb, ct, dilation=dil,
                             interpret=True)
  for nm, gt, wt in zip(('dx', 'dbr', 'dg', 'db', 'dw', 'dcb'),
                        got, want):
    assert gt.dtype == wt.dtype, nm
    # the kernel rounds dacc to bf16 before the dgrad/wgrad dots (MXU
    # operands); the semantics VJP keeps it f32. For the summed
    # per-channel stats (db/dg/...) that rounding accumulates over
    # N*L cancellation-prone terms, so the atol must scale with the
    # output's magnitude, not sit at a fixed constant.
    wt = np.asarray(wt, np.float32)
    np.testing.assert_allclose(
        np.asarray(gt, np.float32), wt,
        atol=0.02 * max(np.abs(wt).max(), 1.0) + 0.02,
        rtol=0.1, err_msg=nm)


def test_cnn_layer_bf16_dtype_discipline():
  """bf16 activations with f32 params must stay bf16 through the
  reference layer (an f32 conv-bias promotion diverged from the Pallas
  kernel's output dtype and broke the custom-VJP cotangent under
  SVDD_CNN_BF16=1), and the VJP must accept bf16 cotangents."""
  from svdd_tpu.ops.cnn_layer_pallas import (_fused_core,
                                             cnn_layer_reference)
  n, l, c, k, dil = 8, 20, 128, 9, 4
  x = _rand(0, (n, l, c)).astype(jnp.bfloat16)
  br = _rand(1, (n, c), 0.5).astype(jnp.bfloat16)
  g = (1.0 + 0.1 * _rand(2, (c,)))            # f32 params
  b = 0.1 * _rand(3, (c,))
  w = _rand(4, (k, c, c), 0.05)
  cb = 0.1 * _rand(5, (c,))
  out = cnn_layer_reference(x, br, g, b, w, cb, dil)
  assert out.dtype == jnp.bfloat16

  def loss(x):
    return jnp.sum(_fused_core(x, br, g, b, w, cb, dil, 1e-6, True)
                   .astype(jnp.float32))
  gx = jax.grad(loss)(x)
  assert gx.dtype == jnp.bfloat16
  assert bool(jnp.isfinite(gx.astype(jnp.float32)).all())


def test_pallas_bwd_length_gate():
  """The fused BACKWARD kernel is gated to the lengths it was tuned
  for: one (64, 50, 128) bwd kernel takes 447 s of Mosaic compile
  standalone, and the ~5 distinct-dilation kernels of an RNA (L=50)
  DPS program starve the remote compile helper to a SIGKILL (r4
  hardware sweep) — while the same program with the XLA reference VJP
  compiles and runs normally. L=200 (DNA) compiles in normal time."""
  from svdd_tpu.ops.cnn_layer_pallas import pallas_bwd_len_ok
  assert not pallas_bwd_len_ok(50)    # RNA decode/train: XLA VJP
  assert pallas_bwd_len_ok(200)       # DNA flagship: fused kernel


def test_cnn_layer_pallas_interpret_flagship_d64_split():
  """The restricted-row tap split (waste>30% layers run |off|>=L/4
  taps as per-tap dots on contributing rows only) at the flagship
  shape's d=64 config — exact vs the reference (hardware probe pins
  bit-exactness vs the all-wide kernel at (5120,200,128),
  scripts/probe_dilation_layers.py)."""
  from svdd_tpu.ops.cnn_layer_pallas import (cnn_layer_pallas,
                                             cnn_layer_reference)
  n, l, c, k = 8, 200, 128, 9
  x = _rand(0, (n, l, c))
  br = _rand(1, (n, c), 0.5)
  g = 1.0 + 0.1 * _rand(2, (c,))
  b = 0.1 * _rand(3, (c,))
  w = _rand(4, (k, c, c), 0.05)
  cb = 0.1 * _rand(5, (c,))
  ref = cnn_layer_reference(x, br, g, b, w, cb, 64)
  out = cnn_layer_pallas(x, br, g, b, w, cb, dilation=64,
                         interpret=True)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             atol=1e-4, rtol=1e-4)
