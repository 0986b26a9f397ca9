"""Flagship DNA pipeline on real hardware: pretrain -> 3-task Enformer
oracle -> Enformer value net -> SVDD-MC/PM guided decode.

The DNA-enhancer analogue of demo_rna_pipeline.py at the reference's
full value-net scale (Enformer-1536, 11 transformer blocks, HepG2 task
index 0 of 3 — decode.py:78-80, oracle.cal_gosai_pred). Writes
log/demo-dna-HepG2{,_tw}{suffix}.npz + log/demo_dna_pipeline{suffix}.json.

--suffix '.run2' --seed_offset 100: an independent second run for the
pooled quality gate (VERDICT r4 weak #6). --m_schedule '64:4,64:10':
additionally decode SVDD-MC with the scheduled-M variant under the
SAME trained nets and record its quantiles (the quality gate for
VERDICT r4 item 2).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_ap = argparse.ArgumentParser()
_ap.add_argument('--suffix', default='')
_ap.add_argument('--seed_offset', type=int, default=0)
_ap.add_argument('--m_schedule', default=None)
ARGS = _ap.parse_args()

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)

T0 = time.perf_counter()
RESULTS = {}


def phase(m):
  print(f'+{time.perf_counter()-T0:7.1f}s {m}', flush=True)


from svdd_tpu import mdlm, value as value_lib
from svdd_tpu.config import dna_config
from svdd_tpu.data.gosai import FaultTolerantIterator, GosaiDataset
from svdd_tpu.decode import run_decode
from svdd_tpu.diffusion import Diffusion
from svdd_tpu.eval.metrics import quantile_report
from svdd_tpu.models.enformer import EnformerValueModel
from svdd_tpu.models import ema as ema_lib
from svdd_tpu.train import diffusion as train_diff
from svdd_tpu.train import value as train_val

cfg = dna_config()
cfg.optim.warmup_steps = 50
cfg.optim.lr = 1e-3
cfg.loader.batch_size = 16   # larger train batches trip an LLO compiler bug
L = cfg.model.length

# stage 1: diffusion pretrain on synthetic enhancers
ds = GosaiDataset('train', length=L)
val_ds = GosaiDataset('val', length=L)
it = iter(FaultTolerantIterator(ds, cfg.loader.batch_size,
                                seed=ARGS.seed_offset))
model = Diffusion(cfg, rng=jax.random.key(0 + ARGS.seed_offset))
trainer = train_diff.Trainer(model, cfg)
state = trainer.init_or_restore(jax.random.key(1 + ARGS.seed_offset))
for i in range(1200):
  batch = {k: jnp.asarray(v) for k, v in next(it).items()}
  state, loss = trainer.train_step(state, batch)
RESULTS['diffusion_loss_last'] = float(loss)
model.variables = {'params': ema_lib.params(state.ema), **state.extras}
phase(f'diffusion pretrained (loss {float(loss):.3f})')

# stage 2: 3-task Enformer oracle on the labels (DNA_evaluation analog)
oracle_module = EnformerValueModel(n_tasks=3, compute_dtype=jnp.bfloat16)
ovars = jax.jit(oracle_module.init)(jax.random.key(2 + ARGS.seed_offset),
                                    jnp.zeros((1, L, 4)))
oparams = ovars.pop('params')
oextras = ovars
opt = optax.adamw(3e-4)
opt_state = opt.init(oparams)


@jax.jit
def oracle_step(params, extras, opt_state, seqs, labels, key):
  def loss_fn(p):
    preds, upd = oracle_module.apply(
        {'params': p, **extras}, jax.nn.one_hot(seqs, 4), train=True,
        mutable=['batch_stats'], rngs={'dropout': key})
    return jnp.mean((preds - labels) ** 2), upd
  (loss, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
  u, opt_state = opt.update(g, opt_state, params)
  return optax.apply_updates(params, u), {**extras, **upd}, \
      opt_state, loss


oit = iter(FaultTolerantIterator(ds, 16, seed=3 + ARGS.seed_offset))
key = jax.random.key(4 + ARGS.seed_offset)
for i in range(400):
  b = next(oit)
  key, sub = jax.random.split(key)
  oparams, oextras, opt_state, oloss = oracle_step(
      oparams, oextras, opt_state, jnp.asarray(b['seqs']),
      jnp.asarray(b['clss']), sub)
oracle_vars = {'params': oparams, **oextras}
preds = np.asarray(oracle_module.apply(
    oracle_vars, jax.nn.one_hot(jnp.asarray(val_ds.seqs[:512]), 4)))
r = np.corrcoef(preds[:, 0], val_ds.clss[:512, 0])[0, 1]
RESULTS['oracle_val_pearson_hepg2'] = float(r)
phase(f'Enformer oracle trained: MSE {float(oloss):.4f}, '
      f'hepg2 val pearson {r:.3f}')


def oracle_apply(variables, onehot):
  return oracle_module.apply(variables, onehot)[:, 0]   # hepg2


oracle_pair = (oracle_apply, oracle_vars)

# stage 3: Enformer value net (MC targets, oracle-style step: the
# ValueTrainer's donated-state grad program breaks the remote compiler
# transport at this scale; plain separate-arg adamw compiles fine)
value_module = EnformerValueModel(n_tasks=1, compute_dtype=jnp.bfloat16)
vvars = jax.jit(value_module.init)(jax.random.key(5 + ARGS.seed_offset),
                                   jnp.zeros((1, L, 4)))
vparams = vvars.pop('params')
vextras = vvars
vopt = optax.adamw(3e-4)
vopt_state = vopt.init(vparams)
traj_sampler = model.sampler(8, collect_mid=True)


@jax.jit
def value_step(params, extras, opt_state, states, targets, key):
  onehots = mdlm.transform_samples(states)
  def loss_fn(p):
    preds, upd = value_module.apply(
        {'params': p, **extras}, onehots, train=True,
        mutable=['batch_stats'], rngs={'dropout': key})
    return jnp.mean((preds - targets) ** 2), upd
  (loss, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
  u, opt_state = vopt.update(g, opt_state, params)
  return optax.apply_updates(params, u), {**extras, **upd}, \
      opt_state, loss


vkey = jax.random.key(6 + ARGS.seed_offset)
vloss0 = None
for i in range(300):
  vkey, k1, k2, k3 = jax.random.split(vkey, 4)
  res = traj_sampler(k1)
  target = oracle_module.apply(
      oracle_vars, mdlm.transform_samples(res.samples))[:, 0]
  idx = jax.random.choice(k2, res.mid_x.shape[0], (3,), replace=False)
  states = jnp.concatenate(
      [jnp.take(res.mid_x, idx, axis=0).reshape(-1, L), res.samples])
  targets = jnp.tile(target, 4)
  vparams, vextras, vopt_state, vloss = value_step(
      vparams, vextras, vopt_state, states, targets, k3)
  if vloss0 is None:
    vloss0 = float(vloss)
    phase(f'value step compiled, first MSE {vloss0:.4f}')
RESULTS['value_mse_first'] = vloss0
RESULTS['value_mse_last'] = float(vloss)
phase(f'value net trained: MSE {vloss0:.4f} -> {float(vloss):.4f}')
value_vars = {'params': vparams, **vextras}


def value_apply(variables, tokens):
  return value_module.apply(variables, mdlm.transform_samples(tokens))


# stage 4: guided decode at the flagship shape
B = 256
mc = run_decode(model, oracle_pair, algo='svdd_mc',
                value_fn=(value_apply, value_vars),
                gen_batch_num=1, batch_size=B, sample_M=10, seed=44 + ARGS.seed_offset)
phase('SVDD-MC decode done')
mc.save_npz(f'log/demo-dna-HepG2{ARGS.suffix}.npz')

pm = run_decode(model, oracle_pair, algo='svdd_pm',
                gen_batch_num=1, batch_size=B, sample_M=10,
                seed=44 + ARGS.seed_offset, skip_best_of_n=True)
phase('SVDD-PM decode done')
pm.save_npz(f'log/demo-dna-HepG2_tw{ARGS.suffix}.npz')

rows = {
    'baseline (pretrained)': mc.baseline_preds,
    'SVDD-MC': mc.reward_preds,
    'SVDD-PM': pm.reward_preds,
    'best-of-N': mc.top_k,
}

if ARGS.m_schedule:
  # scheduled-M SVDD-MC under the SAME trained nets: the quality gate
  # for the frontier candidate (VERDICT r4 item 2)
  from svdd_tpu.utils import parse_m_schedule
  msched = parse_m_schedule(ARGS.m_schedule)
  mcs = run_decode(model, oracle_pair, algo='svdd_mc',
                   value_fn=(value_apply, value_vars),
                   gen_batch_num=1, batch_size=B, sample_M=10,
                   seed=44 + ARGS.seed_offset, skip_best_of_n=True,
                   m_schedule=msched)
  phase(f'SVDD-MC scheduled-M {ARGS.m_schedule} decode done')
  mcs.save_npz(f'log/demo-dna-HepG2_sched{ARGS.suffix}.npz')
  rows[f'SVDD-MC sched {ARGS.m_schedule}'] = mcs.reward_preds
  RESULTS['m_schedule'] = ARGS.m_schedule

report = quantile_report(rows)
RESULTS['report'] = report
for name, row in report.items():
  phase(f"{name:22s} q50={row['q50']:.3f} q80={row['q80']:.3f} "
        f"q90={row['q90']:.3f} (n={row['n']})")
with open(f'log/demo_dna_pipeline{ARGS.suffix}.json', 'w') as f:
  json.dump(RESULTS, f, indent=2)
phase(f'wrote log/demo_dna_pipeline{ARGS.suffix}.json')
