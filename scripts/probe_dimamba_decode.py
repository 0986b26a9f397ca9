"""DiMamba-backbone decode smoke on TPU.

Validates the bidirectional Mamba MDLM backbone (models/dimamba.py —
selective scan as lax.associative_scan replacing mamba-ssm CUDA,
depthwise causal conv replacing causal-conv1d, fused add+RMSNorm
replacing the Triton norms) through the full reverse scan on real
hardware. The reference ships DiMamba configs (tiny-dimamba.yaml) but
comments the backbone out of Diffusion init (diffusion_gosai.py:105).
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


from svdd_tpu.config import dna_config
from svdd_tpu.diffusion import Diffusion

cfg = dna_config()
cfg.model.backbone = 'dimamba'
cfg.sampling.steps = int(os.environ.get('PROBE_STEPS', '64'))
B = int(os.environ.get('PROBE_B', '64'))

model = Diffusion(cfg, rng=jax.random.key(0))
phase(f'DiMamba model init (L={cfg.model.length})')

sampler = model.sampler(B)
x = np.asarray(sampler(jax.random.key(1)).samples)
phase('compile + first decode done')

t0 = time.perf_counter()
x = np.asarray(sampler(jax.random.key(2)).samples)
dt = time.perf_counter() - t0
assert x.shape == (B, cfg.model.length)
assert (x != cfg.mask_index).all()
assert len(np.unique(x)) > 1
phase(f'decode {B}x{cfg.model.length} in {dt:.2f}s '
      f'({B / dt:.1f} seqs/sec; {cfg.sampling.steps} steps)')
