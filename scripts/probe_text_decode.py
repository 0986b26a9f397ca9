"""Text-MDLM (L=1024 DiT + Pallas flash attention) decode smoke on TPU.

Exercises the legacy-text configuration's full reverse scan on
hardware: 12-block DiT at hidden 768, flash_mha dispatching to the
Pallas kernel at L=1024 (ops/flash_attention_pallas.py, 1.7x XLA at
this length in the standalone benchmark)."""
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


from svdd_tpu.config import Config
from svdd_tpu.diffusion import Diffusion

cfg = Config.from_yaml(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'svdd_tpu', 'configs', 'text_mdlm.yaml'))
cfg.sampling.steps = int(os.environ.get('PROBE_STEPS', '64'))
B = int(os.environ.get('PROBE_B', '32'))

phase(f'config: text L={cfg.model.length} vocab={cfg.alphabet_size} '
      f'steps={cfg.sampling.steps}')
model = Diffusion(cfg, rng=jax.random.key(0))
phase('model init')

sampler = model.sampler(B)
out = sampler(jax.random.key(1))
np.asarray(out.samples)
phase('compile + first decode done')

t0 = time.perf_counter()
out = sampler(jax.random.key(2))
x = np.asarray(out.samples)
dt = time.perf_counter() - t0
assert x.shape == (B, cfg.model.length)
assert (x != cfg.mask_index).all(), 'mask tokens survived noise removal'
phase(f'decode {B}x{cfg.model.length} in {dt:.2f}s '
      f'({B / dt:.2f} seqs/sec; {cfg.sampling.steps} steps)')
