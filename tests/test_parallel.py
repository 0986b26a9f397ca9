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


def test_fsdp_train_matches_single_device():
  """ZeRO layout is storage only — the FSDP step must reproduce the
  single-device numerics (guards the fsdp_spec axis rule, which
  changed in r4 to major-most for 23x less traffic)."""
  cfg = tiny_test_config('rna')
  model = Diffusion(cfg, rng=jax.random.key(0))
  batch = _batch(cfg)

  t_single = train_diff.Trainer(model, cfg)
  s_single = t_single.init_or_restore(jax.random.key(1))
  s_single, loss_single = t_single.train_step(s_single, dict(batch))

  cfg_f = tiny_test_config('rna')
  cfg_f.parallel.fsdp = True
  cfg_f.parallel.fsdp_min_size = 256
  mesh = M.make_mesh()
  t_fsdp = train_diff.Trainer(model, cfg_f, mesh=mesh)
  s_fsdp = t_fsdp.init_or_restore(jax.random.key(1))
  s_fsdp, loss_fsdp = t_fsdp.train_step(s_fsdp, t_fsdp._put(dict(batch)))

  np.testing.assert_allclose(float(loss_fsdp), float(loss_single),
                             rtol=1e-5)
  for a, b in zip(jax.tree.leaves(s_fsdp.params),
                  jax.tree.leaves(s_single.params)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-4)


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


def _tiny_enformer_value(length=24):
  from svdd_tpu import mdlm
  from svdd_tpu.models.enformer import EnformerValueModel
  vm = EnformerValueModel(n_tasks=1, n_conv=3, channels=256,
                          n_transformers=2, n_heads=2, key_len=8)
  vv = jax.jit(vm.init)(jax.random.key(5),
                        jnp.zeros((1, length, 4)))
  def apply_fn(variables, tokens):
    return vm.apply(variables, mdlm.transform_samples(tokens))
  return apply_fn, vv


def test_tp_value_params_actually_shard():
  """Megatron TP rules place the transformer matmuls on 'model'
  (mesh.py's own promise; VERDICT r1 item 3)."""
  _, vv = _tiny_enformer_value()
  mesh = M.make_mesh(data=4, model=2)
  tp_vars = M.tp_shard_value_params(vv, mesh)

  def find(tree, *names):
    cur = tree
    for n in names:
      cur = cur[n]
    return cur

  tb = find(tp_vars, 'params', 'EnformerTrunk_0', 'transformer_stack',
            'EnformerTransformerBlock_0')
  to_v = tb['EnformerAttention_0']['to_v']['kernel']     # (2, 256, 256)
  assert {s.data.shape for s in to_v.addressable_shards} == \
      {(2, 256, 128)}, 'to_v must be column-sharded over model'
  to_out = tb['EnformerAttention_0']['to_out']['kernel']
  assert {s.data.shape for s in to_out.addressable_shards} == \
      {(2, 128, 256)}, 'to_out must be row-sharded over model'
  ffn0 = tb['FeedForwardBlock_0']['LinearBlock_0']['Dense_0']['kernel']
  assert {s.data.shape for s in ffn0.addressable_shards} == \
      {(2, 256, 256)}   # (2, 256, 512) column-sharded
  ffn1 = tb['FeedForwardBlock_0']['LinearBlock_1']['Dense_0']['kernel']
  assert {s.data.shape for s in ffn1.addressable_shards} == \
      {(2, 256, 256)}   # (2, 512, 256) row-sharded
  pw = find(tp_vars, 'params', 'EnformerTrunk_0', 'pointwise',
            'Conv1D_0', 'kernel')
  assert {s.data.shape for s in pw.addressable_shards} == \
      {(1, 256, 256)}   # (1, 256, 512) column-sharded
  # conv tower stays replicated by design (see tp_value_spec docstring)
  stem = find(tp_vars, 'params', 'EnformerTrunk_0',
              'EnformerConvTower_0', 'stem_conv', 'kernel')
  assert {s.data.shape for s in stem.addressable_shards} == \
      {(15, 4, 128)}


def test_tp_guided_decode_matches_unsharded():
  """2-way model-sharded (weight-TP) guided decode reproduces the
  single-device tokens exactly."""
  cfg = tiny_test_config('dna')
  model = Diffusion(cfg, rng=jax.random.key(0))
  apply_fn, vv = _tiny_enformer_value(cfg.model.length)

  ref = model.controlled_sampler((apply_fn, vv), 8, sample_M=2,
                                 num_steps=4)
  want = np.asarray(ref(jax.random.key(2)).samples)

  mesh = M.make_mesh(data=4, model=2)
  tp_vars = M.tp_shard_value_params(vv, mesh)
  tp = model.controlled_sampler((apply_fn, tp_vars), 8, sample_M=2,
                                num_steps=4, mesh=mesh, tp=True)
  with mesh:
    got = np.asarray(tp(jax.random.key(2)).samples)
  np.testing.assert_array_equal(got, want)


def test_candidate_sharded_decode_matches_unsharded():
  """Default mesh path: folded B*M candidates sharded over all 8
  devices; numerics match single-device."""
  cfg = tiny_test_config('dna')
  model = Diffusion(cfg, rng=jax.random.key(0))
  apply_fn, vv = _tiny_enformer_value(cfg.model.length)

  ref = model.controlled_sampler((apply_fn, vv), 8, sample_M=2,
                                 num_steps=4)
  want = np.asarray(ref(jax.random.key(3)).samples)

  mesh = M.make_mesh(data=4, model=2)
  sh = model.controlled_sampler((apply_fn, vv), 8, sample_M=2,
                                num_steps=4, mesh=mesh)
  with mesh:
    got = np.asarray(sh(jax.random.key(3)).samples)
  np.testing.assert_array_equal(got, want)


def test_candidate_sharded_pm_decode_matches_unsharded():
  """SVDD-PM under the mesh: the carried winner log_p gather (the
  reuse_posterior path) must compile with candidate sharding and
  reproduce single-device tokens exactly."""
  from svdd_tpu.models.enformer import EnformerValueModel
  cfg = tiny_test_config('dna')
  model = Diffusion(cfg, rng=jax.random.key(0))
  vm = EnformerValueModel(n_tasks=1, n_conv=3, channels=256,
                          n_transformers=2, n_heads=2, key_len=8)
  vv = jax.jit(vm.init)(jax.random.key(5),
                        jnp.zeros((1, cfg.model.length, 4)))
  reward = (lambda variables, onehot: vm.apply(variables, onehot), vv)

  ref = model.tweedie_sampler(reward, 8, sample_M=2, num_steps=4)
  want = np.asarray(ref(jax.random.key(4)).samples)

  mesh = M.make_mesh(data=4, model=2)
  sh = model.tweedie_sampler(reward, 8, sample_M=2, num_steps=4,
                             mesh=mesh)
  with mesh:
    got = np.asarray(sh(jax.random.key(4)).samples)
  np.testing.assert_array_equal(got, want)


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


def test_gpipe_matches_sequential_forward_and_grad():
  """GPipe over the 8-device 'pipe' mesh == sequential composition,
  forward AND backward (the ppermute transpose drives the backward
  schedule), incl. per-sample conditioning as a microbatched arg."""
  from jax.sharding import Mesh
  from svdd_tpu.parallel.pipeline import gpipe, stack_stage_params

  mesh = Mesh(np.asarray(jax.devices()).reshape(8), ('pipe',))
  key = jax.random.key(0)
  n_blocks, d, b = 16, 16, 24
  per_block = [
      {'w': 0.2 * jax.random.normal(jax.random.fold_in(key, i),
                                    (d, d)),
       'b': 0.1 * jax.random.normal(jax.random.fold_in(key, 100 + i),
                                    (d,))}
      for i in range(n_blocks)]
  stacked = stack_stage_params(per_block, blocks_per_stage=2)
  x = jax.random.normal(jax.random.fold_in(key, 999), (b, 5, d))
  cond = jax.random.normal(jax.random.fold_in(key, 777), (b, d))

  def block(p, h, c):
    return jnp.tanh(h @ p['w'] + p['b'] + c[:, None, :])

  def stage_fn(params_k, h, c):
    h, _ = jax.lax.scan(lambda h, p: (block(p, h, c), None),
                        h, params_k)
    return h

  ref = x
  for p in per_block:
    ref = block(p, ref, cond)
  out = jax.jit(lambda sp, x, c: gpipe(
      stage_fn, sp, x, mb_args=(c,), mesh=mesh,
      num_microbatches=8))(stacked, x, cond)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             atol=1e-5, rtol=1e-5)

  def loss_pp(sp):
    return jnp.sum(gpipe(stage_fn, sp, x, mb_args=(cond,), mesh=mesh,
                         num_microbatches=8) ** 2)

  def loss_seq(pb):
    h = x
    for p in pb:
      h = block(p, h, cond)
    return jnp.sum(h ** 2)

  g_pp = jax.jit(jax.grad(loss_pp))(stacked)
  g_seq = stack_stage_params(jax.grad(loss_seq)(per_block), 2)
  for a, want in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(want),
                               atol=1e-4, rtol=1e-4)

  # the backward must stay all-gather-free: stage-param grads live
  # sharded on their stage; only the output/input psums (all-reduce)
  # and the ppermute pair (fwd + transpose) are allowed
  hlo = jax.jit(jax.grad(loss_pp)).lower(stacked).compile().as_text()
  assert hlo.count('all-gather') == 0, 'gpipe backward all-gathers'


def test_gpipe_dit_blocks():
  """Pipeline real DDiTBlocks (adaLN cond + rotary tables as broadcast
  args) across 8 stages; must equal the sequential block stack."""
  from jax.sharding import Mesh
  from svdd_tpu.models.dit import DDiTBlock, rotary_cos_sin
  from svdd_tpu.parallel.pipeline import gpipe, stack_stage_params

  mesh = Mesh(np.asarray(jax.devices()).reshape(8), ('pipe',))
  n_blocks, dim, heads, b, l = 8, 32, 2, 8, 12
  blk = DDiTBlock(dim, heads, cond_dim=dim, dropout=0.0)
  x = jax.random.normal(jax.random.key(0), (b, l, dim))
  c = jax.random.normal(jax.random.key(1), (b, dim))
  cos, sin = rotary_cos_sin(l, dim // heads)

  per_block = []
  for i in range(n_blocks):
    v = blk.init(jax.random.key(10 + i), x, cos, sin, c)
    # non-zero adaLN so blocks actually transform
    v = jax.tree.map(
        lambda a: a + 0.02 * jax.random.normal(
            jax.random.fold_in(jax.random.key(50 + i), a.size % 97),
            a.shape), v)
    per_block.append(v['params'])

  stacked = stack_stage_params(per_block, blocks_per_stage=1)

  def stage_fn(params_k, h, c, cos, sin):
    h, _ = jax.lax.scan(
        lambda h, p: (blk.apply({'params': p}, h, cos, sin, c), None),
        h, params_k)
    return h

  ref = x
  for p in per_block:
    ref = blk.apply({'params': p}, ref, cos, sin, c)

  out = jax.jit(lambda sp: gpipe(
      stage_fn, sp, x, mb_args=(c,), bcast_args=(cos, sin),
      mesh=mesh, num_microbatches=4))(stacked)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             atol=2e-4, rtol=2e-4)


def test_pipeline_dit_forward_matches_apply():
  """pipeline_dit_forward over the 8-stage pipe mesh == dit.apply."""
  from jax.sharding import Mesh
  from svdd_tpu.config import tiny_test_config
  from svdd_tpu.models.dit import DIT
  from svdd_tpu.parallel.pipeline import pipeline_dit_forward

  cfg = tiny_test_config('rna')
  cfg.model.n_blocks = 8
  cfg.model.hidden_size = 32
  cfg.model.cond_dim = 32
  cfg.model.n_heads = 2
  cfg.model.dropout = 0.0
  dit = DIT(cfg, vocab_size=5, compute_dtype=jnp.float32)
  b, l = 8, cfg.model.length
  idx = jax.random.randint(jax.random.key(0), (b, l), 0, 5)
  sigma = jnp.linspace(0.1, 0.9, b)
  variables = dit.init(jax.random.key(1), idx, sigma)
  # zero-init adaLN makes blocks identity; perturb so the pipeline
  # actually has to transport non-trivial activations
  variables = jax.tree.map(
      lambda a: a + 0.03 * jax.random.normal(
          jax.random.key(a.size % 89), a.shape), variables)

  ref = dit.apply(variables, idx, sigma)
  mesh = Mesh(np.asarray(jax.devices()).reshape(8), ('pipe',))
  out = jax.jit(lambda v: pipeline_dit_forward(
      dit, v, idx, sigma, mesh=mesh, num_microbatches=4))(variables)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize('num_mb', [1, 4, 24])
def test_gpipe_microbatch_edge_counts(num_mb):
  """Schedule correctness when microbatches < stages (deep bubbles),
  == stages, and > stages."""
  from jax.sharding import Mesh
  from svdd_tpu.parallel.pipeline import gpipe, stack_stage_params

  mesh = Mesh(np.asarray(jax.devices()).reshape(8), ('pipe',))
  d, b = 8, 24
  per_block = [
      {'w': 0.3 * jax.random.normal(jax.random.key(i), (d, d))}
      for i in range(8)]
  stacked = stack_stage_params(per_block, 1)
  x = jax.random.normal(jax.random.key(99), (b, d))

  def stage_fn(params_k, h):
    h, _ = jax.lax.scan(lambda h, p: (jnp.tanh(h @ p['w']), None),
                        h, params_k)
    return h

  ref = x
  for p in per_block:
    ref = jnp.tanh(ref @ p['w'])
  out = jax.jit(lambda sp: gpipe(stage_fn, sp, x, mesh=mesh,
                                 num_microbatches=num_mb))(stacked)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             atol=1e-5, rtol=1e-5)


def test_gpipe_interleaved_matches_sequential():
  """Interleaved virtual-stage schedule (V chunks/device, ring
  traversed V times) == sequential forward, and grads match
  (beyond-reference; Megatron-style low-latency schedule)."""
  from svdd_tpu.parallel.pipeline import (gpipe_interleaved,
                                          stack_stage_params_interleaved)
  from jax.sharding import Mesh

  s, v, k = 4, 2, 1           # 4 stages x 2 virtual chunks x 1 block
  n_blocks = s * v * k
  dim, b = 16, 8
  key = jax.random.key(0)
  ws = [jax.random.normal(jax.random.fold_in(key, i), (dim, dim))
        / jnp.sqrt(dim) for i in range(n_blocks)]
  x = jax.random.normal(jax.random.fold_in(key, 99), (b, dim))

  def block(w, h):
    return jnp.tanh(h @ w)

  def seq_forward(ws, x):
    for w in ws:
      x = block(w, x)
    return x

  want = seq_forward(ws, x)

  mesh = Mesh(np.asarray(jax.devices()[:s]), ('pipe',))
  stacked = stack_stage_params_interleaved(ws, k, v)
  assert jax.tree.leaves(stacked)[0].shape == (s, v, k, dim, dim)

  def stage_fn(params_k, h):
    h, _ = jax.lax.scan(lambda h, w: (block(w, h), None), h, params_k)
    return h

  got = jax.jit(lambda sp, x: gpipe_interleaved(
      stage_fn, sp, x, mesh=mesh, virtual=v))(stacked, x)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=2e-5, atol=2e-5)

  # gradient parity wrt params AND input
  def loss_pipe(sp, x):
    return (gpipe_interleaved(stage_fn, sp, x, mesh=mesh,
                              virtual=v) ** 2).sum()

  def loss_seq(ws, x):
    return (seq_forward(ws, x) ** 2).sum()

  gp_sp, gp_x = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(stacked, x)
  gs_ws, gs_x = jax.grad(loss_seq, argnums=(0, 1))(ws, x)
  gs_sp = stack_stage_params_interleaved(list(gs_ws), k, v)
  np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gs_x),
                             rtol=2e-4, atol=2e-4)
  np.testing.assert_allclose(np.asarray(gp_sp), np.asarray(gs_sp),
                             rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('virtual', [1, 2])
def test_pipelined_train_step_matches_plain(virtual):
  """pipeline_stages>1 wiring: a full train step (loss + AdamW update)
  with the DiT block stack pipelined over a 4-stage 'pipe' mesh matches
  the unpipelined step bit-for-bit-ish (same keys -> same t draw; the
  pipelined forward is deterministic, dropout=0)."""
  from jax.sharding import Mesh

  cfg = tiny_test_config('rna')
  cfg.backbone = 'dit'
  cfg.model.n_blocks = 8
  cfg.model.dropout = 0.0
  cfg.parallel.pipeline_stages = 4
  cfg.parallel.pipeline_microbatches = 4
  cfg.parallel.pipeline_virtual = virtual
  model = Diffusion(cfg, rng=jax.random.key(0))
  batch = _batch(cfg)

  state0 = train_diff.init_state(model, cfg, jax.random.key(3))
  plain_cfg = cfg.override()
  plain_cfg.parallel.pipeline_stages = 1
  plain = jax.jit(train_diff.make_train_step(model, plain_cfg))
  mesh = Mesh(np.asarray(jax.devices()[:4]), ('pipe',))
  piped = jax.jit(train_diff.make_train_step(model, cfg, mesh))

  s_plain, loss_plain = plain(state0, batch)
  s_pipe, loss_pipe = piped(state0, batch)
  np.testing.assert_allclose(float(loss_pipe), float(loss_plain),
                             rtol=1e-5)
  jax.tree.map(
      lambda a, b: np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), atol=2e-5, rtol=2e-4),
      s_pipe.params, s_plain.params)

  # eval step too (EMA params path)
  ev_plain = jax.jit(train_diff.make_eval_step(model, plain_cfg))
  ev_pipe = jax.jit(train_diff.make_eval_step(model, cfg, mesh))
  nll_a, n_a = ev_plain(s_plain, batch, jax.random.key(5))
  nll_b, n_b = ev_pipe(s_plain, batch, jax.random.key(5))
  np.testing.assert_allclose(float(nll_b), float(nll_a), rtol=1e-5)
  assert float(n_a) == float(n_b)

  # guard-rails: misconfigured mesh / dropout are loud errors
  with pytest.raises(ValueError, match='pipe'):
    train_diff.make_train_step(model, cfg, None)
  if virtual == 1:    # guard is schedule-independent; check once
    cfg_bad = cfg.override()
    cfg_bad.model.dropout = 0.1
    model_bad = Diffusion(cfg_bad, rng=jax.random.key(0))
    with pytest.raises(ValueError, match='dropout'):
      train_diff.make_train_step(model_bad, cfg_bad, mesh)


# -- sharded baseline decoders (VERDICT r3 item 4) --------------------------


def test_tds_sharded_decode_matches_unsharded():
  """TDS's systematic resampling indexes across the WHOLE particle
  batch (guidance.py tds_step; reference diffusion_gosai.py:1282) —
  under a 'data'-sharded B that is a cross-shard gather, exactly the
  op that can silently degrade under pjit. Pin numerics vs
  single-device."""
  from svdd_tpu import rewards
  cfg = tiny_test_config('dna')
  model = Diffusion(cfg, rng=jax.random.key(0))
  reward = rewards.synthetic_motif_oracle(cfg.model.length)

  ref = model.tds_sampler(reward, 8, alpha=0.5, num_steps=4)
  want = np.asarray(ref(jax.random.key(5)).samples)

  mesh = M.make_mesh(data=4, model=2)
  sh = model.tds_sampler(reward, 8, alpha=0.5, num_steps=4, mesh=mesh)
  with mesh:
    res = sh(jax.random.key(5))
    got = np.asarray(res.samples)
  np.testing.assert_array_equal(got, want)
  # the ESS telemetry survives the sharded scan and matches the
  # unsharded trace (weights are computed on the gathered batch)
  np.testing.assert_allclose(np.asarray(res.extra['ess']),
                             np.asarray(ref(jax.random.key(5))
                                        .extra['ess']), rtol=1e-5)


def test_scheduled_m_sharded_decode_matches_unsharded():
  """Scheduled-M SVDD-MC under the candidate-sharded mesh: each phase
  folds a DIFFERENT (B*M_i, L) candidate batch onto the mesh — the
  per-phase shard constraint must reproduce single-device tokens."""
  from svdd_tpu import mdlm, rewards
  cfg = tiny_test_config('dna')
  model = Diffusion(cfg, rng=jax.random.key(0))
  reward = rewards.synthetic_motif_oracle(cfg.model.length)
  vfn = lambda tok: reward(mdlm.transform_samples(tok))
  sched = ((2, 2), (2, 4))

  ref = model.controlled_sampler(vfn, 8, m_schedule=sched, num_steps=4)
  want = np.asarray(ref(jax.random.key(7)).samples)

  mesh = M.make_mesh(data=4, model=2)
  sh = model.controlled_sampler(vfn, 8, m_schedule=sched, num_steps=4,
                                mesh=mesh)
  with mesh:
    got = np.asarray(sh(jax.random.key(7)).samples)
  np.testing.assert_array_equal(got, want)


def test_dps_sharded_decode_matches_unsharded():
  """DPS under a data-sharded batch: the in-scan jax.grad through
  denoiser + reward must reproduce single-device tokens."""
  from svdd_tpu import rewards
  cfg = tiny_test_config('dna')
  model = Diffusion(cfg, rng=jax.random.key(0))
  reward = rewards.synthetic_motif_oracle(cfg.model.length)

  ref = model.dps_sampler(reward, 8, guidance_scale=10.0, num_steps=4)
  want = np.asarray(ref(jax.random.key(6)).samples)

  mesh = M.make_mesh(data=4, model=2)
  sh = model.dps_sampler(reward, 8, guidance_scale=10.0, num_steps=4,
                         mesh=mesh)
  with mesh:
    got = np.asarray(sh(jax.random.key(6)).samples)
  np.testing.assert_array_equal(got, want)


def test_classifier_sharded_decode_matches_unsharded():
  """Classifier guidance under a data-sharded batch: grads flow through
  the value net only; tokens must match single-device."""
  from svdd_tpu import rewards
  cfg = tiny_test_config('dna')
  model = Diffusion(cfg, rng=jax.random.key(0))
  reward = rewards.synthetic_motif_oracle(cfg.model.length)

  ref = model.classifier_sampler(reward, 8, guidance_scale=1.0,
                                 num_steps=4)
  want = np.asarray(ref(jax.random.key(7)).samples)

  mesh = M.make_mesh(data=4, model=2)
  sh = model.classifier_sampler(reward, 8, guidance_scale=1.0,
                                num_steps=4, mesh=mesh)
  with mesh:
    got = np.asarray(sh(jax.random.key(7)).samples)
  np.testing.assert_array_equal(got, want)


# -- distributed value-net training (reference train.py:36-45,295-300
#    NCCL DDP; trainer.py:65-71 DataParallel) -------------------------------


def _value_training_setup(batch_size=8):
  from svdd_tpu import rewards, value as value_lib
  from svdd_tpu.train import value as train_val
  cfg = tiny_test_config('rna')
  model = Diffusion(cfg, rng=jax.random.key(0))
  reward_fn = rewards.synthetic_motif_oracle(cfg.model.length)
  vf = value_lib.ValueFunction.create('rna', cfg.model.length,
                                      jax.random.key(2))
  tcfg = train_val.ValueTrainerConfig(batch_size=batch_size,
                                      learning_rate=1e-3)
  return model, vf, reward_fn, tcfg


def test_value_dp_grads_match_single_device():
  """The VERDICT r3 bar: DP value grads == single-device grads. Same
  fixed regression batch, rows sharded over 'data' (pjit psums the
  grads) vs unsharded — grad trees agree to float-reduction noise."""
  from jax.sharding import NamedSharding, PartitionSpec as P
  from svdd_tpu import value as value_lib
  model, vf, reward_fn, _ = _value_training_setup()
  res = model.sampler(8, collect_mid=True)(jax.random.key(9))
  batch = value_lib.mc_targets(res.samples, res.mid_x, reward_fn)

  variables = dict(vf.variables)
  params = variables.pop('params')

  def loss_fn(p, onehots, targets):
    preds = vf.module.apply({'params': p, **variables}, onehots)
    return jnp.mean((preds.reshape(-1) - targets.reshape(-1)) ** 2)

  g_single = jax.jit(jax.grad(loss_fn))(params, batch.onehots,
                                        batch.targets)

  mesh = M.make_mesh()
  oh = jax.device_put(batch.onehots,
                      NamedSharding(mesh, P('data', None, None)))
  tg = jax.device_put(batch.targets, NamedSharding(mesh, P('data')))
  assert not oh.sharding.is_fully_replicated
  g_dp = jax.jit(jax.grad(loss_fn))(M.replicate(params, mesh), oh, tg)

  for a, b in zip(jax.tree.leaves(g_dp), jax.tree.leaves(g_single)):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-6, rtol=1e-5)


def test_value_dp_train_matches_single_device():
  """DP value training (trajectory batch + every regression row over
  'data', grads psum'd) tracks the single-device step: losses agree
  across two iterations. (Param trees agree except where Adam
  amplifies float-reduction sign flips on ~zero grads — the grad-level
  parity above is the exact check.)"""
  from svdd_tpu.train import value as train_val
  model, vf, reward_fn, tcfg = _value_training_setup()

  t_single = train_val.ValueTrainer(model, vf, reward_fn, tcfg)
  s = t_single.init_state(jax.random.key(3))
  s, loss1_single = t_single._train_step(s, None)
  s, loss2_single = t_single._train_step(s, None)

  mesh = M.make_mesh()
  t_dp = train_val.ValueTrainer(model, vf, reward_fn, tcfg, mesh=mesh)
  sd = t_dp.init_state(jax.random.key(3))
  with mesh:
    sd, loss1_dp = t_dp._train_step(sd, None)
    sd, loss2_dp = t_dp._train_step(sd, None)

  np.testing.assert_allclose(float(loss1_dp), float(loss1_single),
                             rtol=1e-5)
  np.testing.assert_allclose(float(loss2_dp), float(loss2_single),
                             rtol=1e-3)


def test_value_fsdp_actually_shards_and_runs():
  """--fsdp: value-net params + optimizer state shard over 'data'
  (ZeRO-style; beyond the reference) and the step still trains."""
  from svdd_tpu.train import value as train_val
  model, vf, reward_fn, tcfg = _value_training_setup()
  mesh = M.make_mesh()
  tr = train_val.ValueTrainer(model, vf, reward_fn, tcfg, mesh=mesh,
                              fsdp=True, fsdp_min_size=256)
  state = tr.init_state(jax.random.key(3))
  sharded = [p for p in jax.tree.leaves(state.params)
             if not p.sharding.is_fully_replicated]
  assert sharded, 'no value param was FSDP-sharded'
  with mesh:
    state, loss = tr._train_step(state, None)
  assert np.isfinite(float(loss))


def test_value_cdq_dp_train_matches_single_device():
  """CD-Q targets under DP: candidate rollouts shard over 'data' too."""
  from svdd_tpu.train import value as train_val
  model, vf, reward_fn, _ = _value_training_setup()
  tcfg = train_val.ValueTrainerConfig(batch_size=8, cdq=True)

  t_single = train_val.ValueTrainer(model, vf, reward_fn, tcfg)
  s = t_single.init_state(jax.random.key(4))
  s, loss_single = t_single._train_step(s, None)

  mesh = M.make_mesh()
  t_dp = train_val.ValueTrainer(model, vf, reward_fn, tcfg, mesh=mesh)
  sd = t_dp.init_state(jax.random.key(4))
  with mesh:
    sd, loss_dp = t_dp._train_step(sd, None)
  np.testing.assert_allclose(float(loss_dp), float(loss_single),
                             rtol=1e-5)


def test_multisep_dp_train_matches_single_device():
  """MultiSep (time-binned trunks) under the DP mesh: per-bin losses
  and the mean loss match single-device."""
  from svdd_tpu.models.convgru import ConvGRUValueModel
  from svdd_tpu.models.multisep import MultiSepValueModel
  from svdd_tpu import rewards
  from svdd_tpu.train import value as train_val
  cfg = tiny_test_config('rna')
  model = Diffusion(cfg, rng=jax.random.key(0))
  reward_fn = rewards.synthetic_motif_oracle(cfg.model.length)
  msm = MultiSepValueModel(ConvGRUValueModel(), n_models=2,
                           num_steps=cfg.sampling.steps)
  tcfg = train_val.ValueTrainerConfig(batch_size=8, learning_rate=1e-3)

  t_single = train_val.MultiSepTrainer(model, msm, reward_fn, tcfg)
  s = t_single.init_state(jax.random.key(3))
  s, (loss_s, _) = t_single._train_step(s, t_single._reward_vars)

  mesh = M.make_mesh()
  t_dp = train_val.MultiSepTrainer(model, msm, reward_fn, tcfg,
                                   mesh=mesh)
  sd = t_dp.init_state(jax.random.key(3))
  with mesh:
    sd, (loss_d, _) = t_dp._train_step(sd, t_dp._reward_vars)
  np.testing.assert_allclose(float(loss_d), float(loss_s), rtol=1e-5)
