"""Does per-layer remat clear the B>64 CNN-backward LLO SIGILL?

One config per PROCESS (a SIGILL kills the interpreter, so the sweep
driver is a shell loop):

    SVDD_REMAT_CNN_LAYERS={0,1} python scripts/probe_remat_sigill.py B

Runs `steps` diffusion train steps (accum_steps=1 — the monolithic
backward that crashes at B>64, TODO.md) at the flagship dna config and
prints compile + steady-state step time. Reference train shape:
global batch 512 (/root/reference/configs_gosai/config_gosai.yaml:27).
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
  batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
  steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
  accum = int(sys.argv[3]) if len(sys.argv) > 3 else 1
  remat = os.environ.get('SVDD_REMAT_CNN_LAYERS', '0')
  print(f'config: B={batch} steps={steps} accum={accum} '
        f'remat={remat}', flush=True)

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
  print(f'OK step={dt*1e3:.1f} ms  seqs/s={batch/dt:.1f} '
        f'loss={float(loss):.4f}', flush=True)


if __name__ == '__main__':
  main()
