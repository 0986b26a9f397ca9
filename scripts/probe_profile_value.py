"""Profile one value-net train iteration on TPU (jax.profiler) + MFU.

The value trainer runs TWO jitted programs per iteration (train/value.py
_train_step): (1) a full 128-step uncontrolled trajectory sample with
collect_mid, (2) the Enformer grad step on the subsampled intermediate
states. This probe times and FLOP-counts each separately so the
iteration wall has a per-program accounting like the decode/train
rooflines (scripts/roofline_trace.py on the emitted trace). Reference
shape: train.py:249 (batch_size 32), trainer.py:150-208.

    python scripts/probe_profile_value.py [B] [mc_subsample]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')


def main():
  batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
  sub = int(sys.argv[2]) if len(sys.argv) > 2 else 16
  steps = int(os.environ.get('VALUE_PROBE_STEPS', '8'))
  print(f'config: B={batch} mc_subsample={sub}', flush=True)

  from svdd_tpu import rewards, value as value_lib
  from svdd_tpu.config import dna_config
  from svdd_tpu.diffusion import Diffusion
  from svdd_tpu.train import value as train_val

  cfg = dna_config()
  model = Diffusion(cfg, rng=jax.random.key(0))
  reward_fn = rewards.synthetic_motif_oracle(cfg.model.length)
  vf = value_lib.ValueFunction.create('dna', cfg.model.length,
                                      jax.random.key(2))
  tcfg = train_val.ValueTrainerConfig(batch_size=batch, mc_subsample=sub)
  trainer = train_val.ValueTrainer(model, vf, reward_fn, tcfg)
  state = trainer.init_state(jax.random.key(3))

  # warm up + split-phase FLOP accounting
  t0 = time.perf_counter()
  state, loss = trainer._train_step(state, None)
  np.asarray(loss)
  print(f'compile+first iter: {time.perf_counter()-t0:.1f}s '
        f'loss={float(loss):.4f}', flush=True)

  key = jax.random.key(7)
  res = trainer._sampler(key)
  np.asarray(res.samples)

  def flops_of(lowerable, *args):
    try:
      cost = lowerable.lower(*args).compile().cost_analysis()
      return float(cost.get('flops', 0.0))
    except Exception as e:  # noqa: BLE001 - probe must not die to this
      print(f'cost analysis unavailable: {type(e).__name__}: {e}',
            flush=True)
      return 0.0

  # phase 1: trajectory sample (scan body counted once by XLA)
  samp_flops = flops_of(trainer._sampler, key)
  t0 = time.perf_counter()
  for i in range(steps):
    res = trainer._sampler(jax.random.fold_in(key, i))
  np.asarray(res.samples)
  samp_dt = (time.perf_counter() - t0) / steps
  n_steps_scan = cfg.sampling.steps
  print(f'sampler: {samp_dt*1e3:.1f} ms/iter  '
        f'(XLA {samp_flops/1e12:.3f} TFLOP body x ~{n_steps_scan} steps)',
        flush=True)

  # phase 2: grad step on a fixed trajectory
  extra = res.extra if tcfg.cdq else ()
  grad_flops = flops_of(trainer._grad_step, state, res.samples,
                        res.mid_x, extra, trainer._reward_vars)
  t0 = time.perf_counter()
  for _ in range(steps):
    state, loss = trainer._grad_step(state, res.samples, res.mid_x,
                                     extra, trainer._reward_vars)
  np.asarray(loss)
  grad_dt = (time.perf_counter() - t0) / steps
  print(f'grad step: {grad_dt*1e3:.1f} ms/iter  '
        f'(XLA {grad_flops/1e12:.3f} TFLOP; '
        f'{grad_flops/grad_dt/1e12:.1f} TF/s)', flush=True)

  # full iteration wall (what bench.py --algo value_train measures)
  t0 = time.perf_counter()
  for _ in range(steps):
    state, loss = trainer._train_step(state, None)
  np.asarray(loss)
  dt = (time.perf_counter() - t0) / steps
  print(f'full iter: {dt*1e3:.1f} ms  seqs/s={batch/dt:.1f} '
        f'loss={float(loss):.4f}', flush=True)

  trace_dir = '/tmp/jax_trace_value'
  jax.profiler.start_trace(trace_dir)
  for _ in range(steps):
    state, loss = trainer._train_step(state, None)
  np.asarray(loss)
  jax.profiler.stop_trace()
  print('trace done', flush=True)
  for root, _, files in os.walk(trace_dir):
    for f in files:
      p = os.path.join(root, f)
      print(p, os.path.getsize(p), flush=True)


if __name__ == '__main__':
  main()


