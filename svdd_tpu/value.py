"""Value-function API and value-network training targets (MC / CD-Q).

Replaces the reference's BaseModel wrapper (/root/reference/
Enformer.py:21-864), which owned a frozen diffusion model, a frozen
reward oracle, and self-generating training forwards. Per SURVEY.md §1
("L3 constructs L2" inversion), here the decode pipeline *composes*
(diffusion, value_fn, reward_fn) as peers; this module provides:

  ValueFunction       — a flax trunk+head bundle exposing the pure
                        score fns guidance needs
  mc_targets          — full-trajectory MC regression targets
                        (BaseModel.forward training branch,
                        Enformer.py:192-225)
  cdq_targets         — bootstrapped CD-Q targets (Enformer.py:226-259)
  value_loss          — the MSE objective (Enformer.py:54 loss_fct)
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from svdd_tpu import mdlm
from svdd_tpu.models.convgru import ConvGRUValueModel
from svdd_tpu.models.enformer import EnformerValueModel

Array = jnp.ndarray


def build_value_module(task: str, model: str = 'enformer',
                       timed: bool = False, n_tasks: int = 1,
                       **kwargs) -> nn.Module:
  """Value-net factory mirroring the decode CLI's model choices
  (decode.py:73-95: enformer / multienformer / timedenformer; rna tasks
  hard-swap to ConvGRU, Enformer.py:31-50)."""
  if task in ('rna', 'rna_saluki'):
    return ConvGRUValueModel(n_tasks=n_tasks)
  if model == 'enformer':
    return EnformerValueModel(n_tasks=n_tasks, timed=timed, **kwargs)
  if model == 'timedenformer':
    return EnformerValueModel(n_tasks=n_tasks, timed=True, **kwargs)
  raise NotImplementedError(model)


class ValueFunction:
  """Bundle of (module, variables) exposing the pure functions the
  guided samplers consume. ``variables`` may include 'batch_stats'
  (Enformer conv tower BatchNorm) — frozen at scoring time."""

  def __init__(self, module: nn.Module, variables: Any,
               length: int, timed: bool = False):
    self.module = module
    self.variables = variables
    self.length = length
    self.timed = timed

  @classmethod
  def create(cls, task: str, length: int, rng: jax.Array,
             model: str = 'enformer', timed: bool = False,
             n_tasks: int = 1, **kwargs) -> 'ValueFunction':
    module = build_value_module(task, model, timed, n_tasks, **kwargs)
    dummy = jnp.zeros((1, length, 4), jnp.float32)
    if timed:
      variables = jax.jit(module.init)(
          rng, dummy, jnp.zeros((1, length), jnp.int32))
    else:
      variables = jax.jit(module.init)(rng, dummy)
    return cls(module, variables, length, timed)

  # -- pure scoring fns -----------------------------------------------------

  def score_onehot(self, onehot4: Array, variables: Any = None,
                   time_indices: Array | None = None) -> Array:
    """(N, L, 4) one-hot -> (N,) value."""
    variables = self.variables if variables is None else variables
    if self.timed:
      return self.module.apply(variables, onehot4, time_indices)
    return self.module.apply(variables, onehot4)

  def score_tokens(self, tokens: Array, variables: Any = None,
                   time_indices: Array | None = None) -> Array:
    """(N, L) int tokens (MASK rows zeroed in the one-hot) -> (N,)."""
    return self.score_onehot(mdlm.transform_samples(tokens), variables,
                             time_indices)

  def as_token_fn(self, variables: Any = None) -> Callable[[Array], Array]:
    return lambda tokens: self.score_tokens(tokens, variables)

  def as_onehot_fn(self, variables: Any = None) -> Callable[[Array], Array]:
    return lambda onehot: self.score_onehot(onehot, variables)

  # hoisted (apply_fn, variables) pairs: the samplers jit these with
  # the variables as ARGUMENTS so the net's weights never get inlined
  # as HLO constants (see Diffusion._hoist)

  def as_token_pair(self):
    module = self.module
    def apply_fn(variables, tokens):
      return module.apply(variables, mdlm.transform_samples(tokens))
    return apply_fn, self.variables

  def as_onehot_pair(self):
    module = self.module
    def apply_fn(variables, onehot):
      return module.apply(variables, onehot)
    return apply_fn, self.variables


# ---------------------------------------------------------------------------
# Training targets
# ---------------------------------------------------------------------------


class ValueBatch(NamedTuple):
  onehots: Array   # (N, L, 4) states (all timesteps flattened)
  targets: Array   # (N,) regression targets
  time_indices: Optional[Array] = None  # (N, L) for timed models


def mc_targets(samples: Array, mid_x: Array, reward_fn,
               subsample_key: Optional[jax.Array] = None,
               num_subsample: Optional[int] = None) -> ValueBatch:
  """Monte-Carlo targets: every intermediate state regresses onto the
  final sample's reward (Enformer.py:192-225).

  samples: (B, L) final tokens; mid_x: (S-1, B, L) intermediates.
  Produces S*B training pairs (S-1 mids + the final state).

  ``num_subsample`` keeps only that many RANDOM intermediate timesteps
  per iteration (equal in expectation to the reference's train-on-all-
  timesteps loss; used for the big Enformer value net where the full
  S*B grad batch overwhelms the TPU compiler)."""
  s_minus_1, b, l = mid_x.shape
  final_onehot = mdlm.transform_samples(samples)
  target = reward_fn(final_onehot)                       # (B,)
  if num_subsample is not None and num_subsample < s_minus_1:
    if subsample_key is None:
      raise ValueError('num_subsample requires subsample_key')
    idx = jax.random.choice(subsample_key, s_minus_1,
                            (num_subsample,), replace=False)
    mid_x = jnp.take(mid_x, idx, axis=0)
    steps = jnp.concatenate([idx, jnp.asarray([s_minus_1])])
    s_minus_1 = num_subsample
  else:
    steps = jnp.arange(s_minus_1 + 1)
  states = jnp.concatenate(
      [mid_x.reshape(-1, l), samples], axis=0)           # (S'*B, L)
  onehots = mdlm.transform_samples(states)
  targets = jnp.tile(target, s_minus_1 + 1)
  time_idx = jnp.repeat(steps, b)[:, None] * jnp.ones((1, l), jnp.int32)
  return ValueBatch(onehots, targets, time_idx)


def cdq_targets(samples: Array, mid_x: Array, all_candidates: Array,
                reward_fn, value_fn) -> ValueBatch:
  """CD-Q bootstrapped targets (Enformer.py:226-259): the target for
  the state after step j is the mean value of the candidate next-states
  drawn at step j+1 (stop-gradient), and the final state regresses on
  the true reward.

  all_candidates: (S, B, M, L) per-step rollouts from cdq_sampler.
  """
  s, b, m, l = all_candidates.shape
  final_onehot = mdlm.transform_samples(samples)
  target = reward_fn(final_onehot)                       # (B,)

  # mean value over candidates at times 1..S-1 (skip time 0, :233-235)
  cand = all_candidates[1:].reshape((s - 1) * b * m, l)
  cand_vals = jax.lax.stop_gradient(
      value_fn(mdlm.transform_samples(cand)))
  case_avg = cand_vals.reshape(s - 1, b, m).mean(axis=-1)  # (S-1, B)

  states = jnp.concatenate([mid_x.reshape(-1, l), samples], axis=0)
  onehots = mdlm.transform_samples(states)
  targets = jnp.concatenate([case_avg.reshape(-1), target], axis=0)
  return ValueBatch(onehots, targets)


def value_loss(value_fn_onehot, batch: ValueBatch) -> Array:
  """MSE objective (Enformer.py:54, :222-225)."""
  preds = value_fn_onehot(batch.onehots)
  return jnp.mean((preds.reshape(-1) - batch.targets.reshape(-1)) ** 2)
