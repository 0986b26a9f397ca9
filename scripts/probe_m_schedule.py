"""Quality-vs-M frontier for scheduled-M SVDD-MC (VERDICT r4 item 2).

The per-step cost of SVDD-MC is dominated by the value forward on the
B*M candidate batch (r3 trace: ~106 of 112.8 ms/step at B=512/M=10);
the early near-all-mask steps unmask ~L/steps positions and their
candidates barely differ, so a smaller M there may cost no quality.
This probe measures both sides of the tradeoff at the flagship decode
shape (B=512, steps=128, L=200):

Part A — QUALITY (fast-compiling program): the synthetic motif oracle
serves as value + reward (the midscale quality gate's setup,
tests/test_quality_regression.py), guided decodes run per schedule
over several seeds, and the reward q50/mean lift over the unguided
baseline is reported per schedule.

Part B — THROUGHPUT (optional, --throughput): the bench workload
(random-init full Enformer value net, bf16) timed for const-M=10 vs
one chosen schedule. NB each schedule is a new large program: expect
minutes of remote compile per variant.

    python scripts/probe_m_schedule.py [--batch 512] [--steps 128]
        [--seeds 3] [--throughput]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault('SVDD_CNN_BF16', '1')

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)


def quantiles(r):
  r = np.asarray(r)
  return {'q50': float(np.quantile(r, 0.5)),
          'q80': float(np.quantile(r, 0.8)),
          'mean': float(r.mean())}


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--batch', type=int, default=512)
  p.add_argument('--steps', type=int, default=128)
  p.add_argument('--length', type=int, default=200)
  p.add_argument('--seeds', type=int, default=3)
  p.add_argument('--throughput', action='store_true')
  p.add_argument('--round', type=int, default=1,
                 help='1: early-cut sweep; 2: late-cut + equal-cost '
                      'reallocation sweep')
  args = p.parse_args()

  from svdd_tpu import mdlm, rewards
  from svdd_tpu.config import dna_config
  from svdd_tpu.data.gosai import FaultTolerantIterator, GosaiDataset
  from svdd_tpu.diffusion import Diffusion
  from svdd_tpu.models import ema as ema_lib
  from svdd_tpu.train import diffusion as train_diff

  cfg = dna_config()
  cfg.model.length = args.length
  cfg.sampling.steps = args.steps
  cfg.optim.warmup_steps = 50
  cfg.optim.lr = 1e-3
  cfg.loader.batch_size = 16
  model = Diffusion(cfg, rng=jax.random.key(0))

  # short pretrain on the synthetic enhancers (demo_dna_pipeline
  # stage 1): an UNTRAINED dna-config denoiser collapses to all-'A'
  # (measured: 799/800 tokens = A), leaving no distribution for
  # selection to act on — the frontier needs a real p(x0)
  ds = GosaiDataset('train', length=args.length)
  it = iter(FaultTolerantIterator(ds, cfg.loader.batch_size, seed=0))
  trainer = train_diff.Trainer(model, cfg)
  state = trainer.init_or_restore(jax.random.key(1))
  import jax.numpy as jnp
  for i in range(1200):
    batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    state, loss = trainer.train_step(state, batch)
  model.variables = {'params': ema_lib.params(state.ema),
                     **state.extras}
  print(f'pretrained 1200 steps, loss {float(loss):.3f}', flush=True)

  reward_fn = rewards.synthetic_motif_oracle(args.length)
  value_fn = lambda tok: reward_fn(mdlm.transform_samples(tok))

  s = args.steps
  if args.round == 1:
    schedules = {
        'constM10': None,
        'constM4': [(s, 4)],
        'early4_half': [(s // 2, 4), (s - s // 2, 10)],
        'early4_quarter': [(s // 4, 4), (s - s // 4, 10)],
        'early2_half': [(s // 2, 2), (s - s // 2, 10)],
        'early1_half': [(s // 2, 1), (s - s // 2, 10)],
    }
  elif args.round == 2:
    # round 2: mirrored late cuts + equal-cost reallocations — is the
    # M-sensitivity asymmetric across the trajectory?
    schedules = {
        'constM10': None,
        'late4_half': [(s // 2, 10), (s - s // 2, 4)],
        'late4_quarter': [(s - s // 4, 10), (s // 4, 4)],
        'realloc_4_16': [(s // 2, 4), (s - s // 2, 16)],   # cost == M10
        'realloc_16_4': [(s // 2, 16), (s - s // 2, 4)],   # cost == M10
        'constM16': [(s, 16)],
    }
  elif args.round == 3:
    # round 3: noise floor (more seeds on the round-2 leaders) + one
    # front-loaded equal-cost variant
    schedules = {
        'constM10': None,
        'late4_quarter': [(s - s // 4, 10), (s // 4, 4)],
        'front12_4': [(s - s // 4, 12), (s // 4, 4)],      # cost == M10
    }
  else:
    # round 4: 3-phase equal-cost tapers (all 10*s value rows) — can a
    # steeper front-load beat the round-3 winner front12_4?
    q = s // 4
    schedules = {
        'front12_4': [(s - q, 12), (q, 4)],
        'p3_14_8_4': [(2 * q, 14), (q, 8), (q, 4)],
        'p3_16_10_4': [(q, 16), (2 * q, 10), (q, 4)],
        'p3_12_6_2': [(3 * q, 12), (q // 2, 6), (q // 2, 2)],
        'front11_3': [(s - q // 2, 11), (q // 2, 3)],
    }

  # ---- Part A: quality (synthetic oracle as value + reward) ----
  base_rows = []
  base = model.sampler(args.batch)
  for seed in range(args.seeds):
    toks = base(jax.random.key(100 + seed)).samples
    base_rows.append(np.asarray(reward_fn(mdlm.transform_samples(toks))))
  bq = quantiles(np.concatenate(base_rows))
  print(f'baseline (unguided): {bq}', flush=True)

  for name, sched in schedules.items():
    t0 = time.perf_counter()
    sampler = model.controlled_sampler(
        value_fn, args.batch, sample_M=10, m_schedule=sched)
    rows, times = [], []
    for seed in range(args.seeds):
      t1 = time.perf_counter()
      toks = sampler(jax.random.key(100 + seed)).samples
      r = np.asarray(reward_fn(mdlm.transform_samples(toks)))
      times.append(time.perf_counter() - t1)
      rows.append(r)
    q = quantiles(np.concatenate(rows))
    # value forwards per decode per row, as a cost proxy
    cost = sum(n * m for n, m in (sched or [(s, 10)]))
    print(f'{name:16s}: {q}  lift_q50={q["q50"] - bq["q50"]:+.3f} '
          f'value_rows/seq={cost} '
          f'wall={min(times[1:] or times):.2f}s '
          f'(first {times[0]:.1f}s incl compile; '
          f'total {time.perf_counter() - t0:.1f}s)', flush=True)

  # ---- Part B: throughput with the real Enformer value net ----
  if not args.throughput:
    return
  from svdd_tpu.models.enformer import EnformerValueModel
  value_module = EnformerValueModel(n_tasks=1,
                                    compute_dtype=jnp.bfloat16)
  value_vars = jax.jit(value_module.init)(
      jax.random.key(1), jnp.zeros((1, args.length, 4)))

  def value_apply(variables, tokens):
    onehot = mdlm.transform_samples(tokens)
    return value_module.apply(variables, onehot)

  for name, sched in (('constM10', None),
                      ('early4_half', [(s // 2, 4), (s - s // 2, 10)])):
    sampler = model.controlled_sampler(
        (value_apply, value_vars), args.batch, sample_M=10,
        m_schedule=sched)
    t0 = time.perf_counter()
    np.asarray(sampler(jax.random.key(0)).samples)
    print(f'{name}: compile+first decode {time.perf_counter()-t0:.1f}s',
          flush=True)
    times = []
    for i in range(3):
      t1 = time.perf_counter()
      np.asarray(sampler(jax.random.fold_in(jax.random.key(0),
                                            i)).samples)
      times.append(time.perf_counter() - t1)
    dt = min(times)
    print(f'{name}: best {dt:.2f}s = {args.batch/dt:.1f} seqs/s/chip '
          f'[{", ".join(f"{t:.2f}" for t in times)}]', flush=True)


if __name__ == '__main__':
  main()
