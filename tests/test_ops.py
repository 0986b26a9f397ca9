"""Pallas kernels (interpret mode on CPU) vs XLA references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svdd_tpu.ops import attention as attn_ops


def test_pallas_attention_matches_xla_interpret():
  from jax.experimental import pallas as pl
  from svdd_tpu.ops import flash_attention_pallas as fap
  import functools

  key = jax.random.key(0)
  b, l, h, d = 2, 128, 2, 64
  q, k, v = jax.random.normal(key, (3, b, l, h, d))

  # run the kernel in interpreter mode by monkeypatching pallas_call
  orig = pl.pallas_call
  def interp_call(*args, **kwargs):
    kwargs['interpret'] = True
    return orig(*args, **kwargs)
  pl.pallas_call = interp_call
  try:
    fap.flash_attention._clear_cache()
    out = fap.flash_attention(q, k, v)
    out_causal = fap.flash_attention(q, k, v, causal=True)
  finally:
    pl.pallas_call = orig
    fap.flash_attention._clear_cache()

  ref = attn_ops.mha(q, k, v)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             atol=2e-3)
  ref_c = attn_ops.mha(q, k, v, causal=True)
  np.testing.assert_allclose(np.asarray(out_causal), np.asarray(ref_c),
                             atol=2e-3)


def test_fused_rmsnorm_matches_reference():
  from svdd_tpu.ops.norms import fused_add_rmsnorm, _rmsnorm_ref
  key = jax.random.key(1)
  x = jax.random.normal(key, (4, 16, 128))
  r = jax.random.normal(jax.random.key(2), (4, 16, 128))
  s = jnp.ones((128,)) * 1.5
  out = fused_add_rmsnorm(x, r, s)
  ref = _rmsnorm_ref(x, r, s)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             atol=1e-5)
  # hand check: rms of output rows (pre-scale) ~= 1
  y = np.asarray(out) / 1.5
  np.testing.assert_allclose(np.sqrt((y ** 2).mean(-1)), 1.0,
                             rtol=1e-3)


def test_mha_causal_masks_future():
  key = jax.random.key(3)
  q = jax.random.normal(key, (1, 8, 1, 16))
  k, v = q, q
  out = attn_ops.mha(q, k, v, causal=True)
  # position 0 attends only to itself -> output == v[0]
  np.testing.assert_allclose(np.asarray(out[0, 0, 0]),
                             np.asarray(v[0, 0, 0]), atol=1e-5)


def test_fused_gumbel_candidates_xla_dispatcher():
  """The dispatcher's XLA path (the default): distribution + copy-flag
  semantics. The Pallas PRNG path needs real TPU hardware
  (prng_seed has no CPU lowering) and is exercised by the TPU bench
  with SVDD_PALLAS_SAMPLER=1."""
  from svdd_tpu.ops import fused_sample as fs
  log_q = jnp.log(jnp.broadcast_to(
      jnp.array([0.1, 0.2, 0.3, 0.4, 1e-9]), (64, 4, 5)))
  x = jnp.full((64, 4), 4, jnp.int32).at[:, 0].set(2)
  out = np.asarray(fs.gumbel_candidates(
      jax.random.key(0), log_q, x, repeats=8, mask_index=4))
  assert out.shape == (64, 8, 4)
  assert (out[:, :, 0] == 2).all()
  draws = out[:, :, 1:].reshape(-1)
  freqs = np.bincount(draws, minlength=5) / draws.size
  np.testing.assert_allclose(freqs[:4], [0.1, 0.2, 0.3, 0.4],
                             atol=0.035)
  assert freqs[4] == 0.0
