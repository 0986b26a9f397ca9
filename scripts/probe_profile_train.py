"""Profile one diffusion train step on TPU (jax.profiler) + MFU.

Runs the sweep-validated fastest config by default (global batch 512 as
4x128 microbatches, per-layer remat — TODO.md train table) and reports
XLA-counted FLOPs/step so the trace gives a train-side MFU accounting
like the decode roofline (scripts/roofline_trace.py on the emitted
trace). Reference train shape: global batch 512
(/root/reference/configs_gosai/config_gosai.yaml:27).

    SVDD_REMAT_CNN_LAYERS=1 python scripts/probe_profile_train.py [B] [accum]
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
  batch = int(sys.argv[1]) if len(sys.argv) > 1 else 512
  accum = int(sys.argv[2]) if len(sys.argv) > 2 else 4
  steps = int(os.environ.get('TRAIN_PROBE_STEPS', '8'))
  print(f'config: B={batch} accum={accum} '
        f"remat={os.environ.get('SVDD_REMAT_CNN_LAYERS', '0')}", flush=True)

  from svdd_tpu.config import dna_config
  from svdd_tpu.diffusion import Diffusion
  from svdd_tpu.train import diffusion as train_diff

  cfg = dna_config()
  cfg.training.accum_steps = accum
  model = Diffusion(cfg, rng=jax.random.key(0))
  trainer = train_diff.Trainer(model, cfg)
  state = trainer.init_or_restore(jax.random.key(1))
  rng = np.random.default_rng(0)
  batch_data = {
      'seqs': jnp.asarray(rng.integers(0, 4, (batch, cfg.model.length)),
                          jnp.int32),
      'attention_mask': jnp.ones((batch, cfg.model.length)),
  }

  # XLA-counted FLOPs of the whole step (fwd+bwd+optax), for MFU.
  try:
    cost = trainer.train_step.lower(state, batch_data).compile(
    ).cost_analysis()
    flops = float(cost.get('flops', 0.0))
    print(f'XLA cost analysis: {flops/1e12:.3f} TFLOP/step', flush=True)
  except Exception as e:  # noqa: BLE001 - probe must not die to this
    flops = 0.0
    print(f'cost analysis unavailable: {type(e).__name__}: {e}',
          flush=True)

  t0 = time.perf_counter()
  state, loss = trainer.train_step(state, batch_data)
  np.asarray(loss)
  print(f'compile+first step: {time.perf_counter()-t0:.1f}s '
        f'loss={float(loss):.4f}', flush=True)

  t0 = time.perf_counter()
  for _ in range(steps):
    state, loss = trainer.train_step(state, batch_data)
  np.asarray(loss)
  dt = (time.perf_counter() - t0) / steps
  print(f'steady: step={dt*1e3:.1f} ms  seqs/s={batch/dt:.1f} '
        f'loss={float(loss):.4f}', flush=True)
  if flops:
    print(f'wall MFU vs 197 TF/s bf16 peak-equivalent: '
          f'{flops/dt/197e12*100:.1f}%  ({flops/dt/1e12:.1f} TF/s)',
          flush=True)

  trace_dir = '/tmp/jax_trace_train'
  jax.profiler.start_trace(trace_dir)
  for _ in range(steps):
    state, loss = trainer.train_step(state, batch_data)
  np.asarray(loss)
  jax.profiler.stop_trace()
  print('trace done', flush=True)
  for root, _, files in os.walk(trace_dir):
    for f in files:
      p = os.path.join(root, f)
      print(p, os.path.getsize(p), flush=True)


if __name__ == '__main__':
  main()
