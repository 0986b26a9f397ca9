"""Hardware smoke for the last two untimed paths: semi-AR strided
text generation and CDQ (bootstrapped-target) value training.

Run one stage per process (argv: semiar | cdq) so a failure isolates.
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
T0 = time.perf_counter()


def phase(m):
  print(f'+{time.perf_counter()-T0:7.1f}s {m}', flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else 'semiar'

if which == 'semiar':
  # strided text generation (reference
  # restore_model_and_semi_ar_sample, diffusion_gosai.py:1864-1895)
  from svdd_tpu.config import Config
  from svdd_tpu.diffusion import Diffusion
  from svdd_tpu.sampling.semi_ar import semi_ar_sample

  cfg = Config.from_yaml(os.path.join(
      os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
      'svdd_tpu', 'configs', 'text_mdlm.yaml'))
  cfg.model.length = 256
  cfg.model.n_blocks = 4
  model = Diffusion(cfg, rng=jax.random.key(0))
  phase('semi-AR model init (L=256 window)')
  t0 = time.perf_counter()
  steps, blocks, samples = semi_ar_sample(
      model, n_samples=8, stride_length=128, num_strides=3,
      key=jax.random.key(1), dt=1 / 64)
  dt_ = time.perf_counter() - t0
  total_len = samples.shape[1]
  assert (samples != cfg.mask_index).all()
  phase(f'semi-AR: {samples.shape[0]}x{total_len} tokens in {dt_:.1f}s '
        f'({steps} denoiser cache-misses across '
        f'{len(blocks)} strides)')

elif which == 'cdq':
  # CDQ value training step (reference Enformer.py:226-259 +
  # _sample(cdq=True), diffusion_gosai.py:839-853)
  from svdd_tpu.config import dna_config
  from svdd_tpu.diffusion import Diffusion
  from svdd_tpu import rewards, value as value_lib
  from svdd_tpu.train import value as train_val

  cfg = dna_config()
  cfg.sampling.steps = 32
  model = Diffusion(cfg, rng=jax.random.key(0))
  reward_fn = rewards.synthetic_motif_oracle(cfg.model.length)
  vf = value_lib.ValueFunction.create('rna', cfg.model.length,
                                      jax.random.key(2))
  tcfg = train_val.ValueTrainerConfig(batch_size=8, cdq=True)
  trainer = train_val.ValueTrainer(model, vf, reward_fn, tcfg)
  state = trainer.init_state(jax.random.key(3))
  phase('CDQ trainer ready')
  state, loss0 = trainer._train_step(state, None)
  np.asarray(loss0)
  phase(f'CDQ step compiled, first loss {float(loss0):.4f}')
  t0 = time.perf_counter()
  for _ in range(5):
    state, loss = trainer._train_step(state, None)
  np.asarray(loss)
  phase(f'5 CDQ steps in {time.perf_counter()-t0:.2f}s '
        f'(loss {float(loss):.4f})')
