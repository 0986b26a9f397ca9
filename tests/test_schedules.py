"""Schedules: closed-form expectations (reference noise_schedule.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from svdd_tpu import schedules


def test_loglinear_closed_form():
  s = schedules.loglinear(eps=1e-3)
  t = jnp.array([0.0, 0.25, 0.5, 0.9])
  sigma, dsigma = s(t)
  np.testing.assert_allclose(sigma, -np.log1p(-(1 - 1e-3) * np.asarray(t)),
                             rtol=5e-4)
  np.testing.assert_allclose(dsigma,
                             (1 - 1e-3) / (1 - (1 - 1e-3) * np.asarray(t)),
                             rtol=5e-4)
  # masking prob 1 - exp(-sigma) == (1-eps) t
  np.testing.assert_allclose(1 - np.exp(-np.asarray(sigma)),
                             (1 - 1e-3) * np.asarray(t),
                             rtol=5e-4, atol=1e-6)


def test_rate_is_derivative_of_total():
  # finite-difference check for every schedule
  for sched in [schedules.loglinear(), schedules.cosine(),
                schedules.cosinesqr(), schedules.linear(0.0, 10.0),
                schedules.geometric(1e-3, 1.0)]:
    t = jnp.linspace(0.05, 0.95, 7)
    h = 1e-4
    fd = (sched.total(t + h) - sched.total(t - h)) / (2 * h)
    np.testing.assert_allclose(sched.rate(t), fd, rtol=2e-2,
                               err_msg=sched.name)


def test_cosine_matches_reference_formula():
  eps = 1e-3
  s = schedules.cosine(eps)
  t = jnp.array([0.3])
  expected = -np.log(eps + (1 - eps) * np.cos(0.3 * np.pi / 2))
  np.testing.assert_allclose(s.total(t), [expected], rtol=1e-4)


def test_factory():
  assert schedules.get_schedule('loglinear').name == 'loglinear'
  assert schedules.get_schedule('geometric').name == 'geometric'
  with pytest.raises(ValueError):
    schedules.get_schedule('bogus')


def test_importance_transform_endpoints():
  s = schedules.loglinear()
  t = jnp.array([0.0, 1.0])
  out = s.importance_transform(t)
  assert float(out[0]) >= 0.0
  assert float(out[1]) <= 1.0 + 1e-6
