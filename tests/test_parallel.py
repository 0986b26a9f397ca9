"""Sharded training/decoding on the 8-device virtual CPU mesh.

Capabilities the reference never tests (SURVEY.md §4: multi-node is
never tested there): DP-sharded train steps match single-device
numerics, FSDP actually shards parameters, guided decode runs under a
('data','model') mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from svdd_tpu.config import tiny_test_config
from svdd_tpu.diffusion import Diffusion
from svdd_tpu.parallel import mesh as M
from svdd_tpu.train import diffusion as train_diff

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')


def _batch(cfg, b=8):
  key = jax.random.key(7)
  return {'seqs': jax.random.randint(key, (b, cfg.model.length), 0, 4),
          'attention_mask': jnp.ones((b, cfg.model.length))}


def test_mesh_shapes():
  mesh = M.make_mesh()
  assert mesh.shape == {'data': 8, 'model': 1}
  mesh2 = M.make_mesh(data=4, model=2)
  assert mesh2.shape == {'data': 4, 'model': 2}
  with pytest.raises(ValueError):
    M.make_mesh(data=3, model=2)


def test_dp_train_matches_single_device():
  cfg = tiny_test_config('rna')
  model = Diffusion(cfg, rng=jax.random.key(0))
  batch = _batch(cfg)

  t_single = train_diff.Trainer(model, cfg)
  s_single = t_single.init_or_restore(jax.random.key(1))
  s_single, loss_single = t_single.train_step(s_single, dict(batch))

  mesh = M.make_mesh()
  t_dp = train_diff.Trainer(model, cfg, mesh=mesh)
  s_dp = t_dp.init_or_restore(jax.random.key(1))
  s_dp, loss_dp = t_dp.train_step(s_dp, t_dp._put(dict(batch)))

  np.testing.assert_allclose(float(loss_single), float(loss_dp),
                             rtol=1e-5)
  # parameters after the step agree too
  p1 = jax.tree.leaves(s_single.params)[0]
  p2 = jax.tree.leaves(s_dp.params)[0]
  np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-5)


def test_fsdp_actually_shards():
  cfg = tiny_test_config('rna')
  cfg.parallel.fsdp = True
  cfg.parallel.fsdp_min_size = 256   # tiny test params
  model = Diffusion(cfg, rng=jax.random.key(0))
  mesh = M.make_mesh()
  trainer = train_diff.Trainer(model, cfg, mesh=mesh)
  state = trainer.init_or_restore(jax.random.key(1))
  # at least one large parameter must be sharded over 'data'
  sharded = [
      p for p in jax.tree.leaves(state.params)
      if not p.sharding.is_fully_replicated
  ]
  assert sharded, 'no parameter was FSDP-sharded'
  # and the train step still runs + returns finite loss
  state, loss = trainer.train_step(state, trainer._put(_batch(cfg)))
  assert np.isfinite(float(loss))


def test_guided_decode_under_mesh():
  from svdd_tpu import mdlm, rewards
  cfg = tiny_test_config('rna')
  model = Diffusion(cfg, rng=jax.random.key(0))
  reward = rewards.synthetic_motif_oracle(cfg.model.length)
  value_fn = lambda tok: reward(mdlm.transform_samples(tok))
  mesh = M.make_mesh()
  sampler = model.controlled_sampler(value_fn, 8, sample_M=2,
                                     num_steps=4)
  with mesh:
    res = sampler(jax.random.key(2))
  x = np.asarray(res.samples)
  assert (x >= 0).all() and (x < 4).all()


def test_batch_sharding_layout():
  mesh = M.make_mesh()
  batch = {'seqs': jnp.zeros((16, 8), jnp.int32)}
  sharded = M.shard_batch(batch, mesh)
  shard_shapes = [s.data.shape for s in
                  sharded['seqs'].addressable_shards]
  assert all(s == (2, 8) for s in shard_shapes)


def test_sequence_parallel_attention_matches_local():
  """sp_mha (L sharded over 'model', K/V all-gathered over ICI) must
  equal single-device attention, causal and non-causal."""
  import jax.numpy as jnp
  import numpy as np
  from svdd_tpu.ops.attention import mha, sp_mha
  from svdd_tpu.parallel import mesh as M

  mesh = M.make_mesh(data=2, model=4)
  B, L, H, D = 2, 32, 2, 8
  q = jax.random.normal(jax.random.key(0), (B, L, H, D))
  k = jax.random.normal(jax.random.key(1), (B, L, H, D))
  v = jax.random.normal(jax.random.key(2), (B, L, H, D))
  for causal in (False, True):
    ref = mha(q, k, v, causal=causal)
    with mesh:
      out = sp_mha(q, k, v, mesh, axis='model', causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
