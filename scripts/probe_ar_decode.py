"""AR-backbone ancestral decode smoke on TPU.

Validates the causal AR baseline (models/autoregressive.py — the
reference's AR backbone, models/autoregressive.py:322 + _ar_sampler
loop diffusion_gosai.py:802-818) end to end on real hardware: the
L-step position scan with full-prefix forwards, Gumbel pre-draw, and
flash/XLA causal attention dispatch.
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
from svdd_tpu.models.autoregressive import ARModel, ar_sample

cfg = dna_config()
cfg.model.backbone = 'ar'
B = int(os.environ.get('PROBE_B', '64'))
L = cfg.model.length

model = ARModel(cfg, vocab_size=5)
variables = jax.jit(model.init)(
    jax.random.key(0), jnp.zeros((1, L), jnp.int32),
    jnp.zeros((1,)))
phase(f'AR model init (L={L})')

fn = jax.jit(lambda v, k: ar_sample(model, v, B, L, k))
x = np.asarray(fn(variables, jax.random.key(1)))
phase('compile + first decode done')

t0 = time.perf_counter()
x = np.asarray(fn(variables, jax.random.key(2)))
dt = time.perf_counter() - t0
assert x.shape == (B, L)
assert len(np.unique(x)) > 1
phase(f'AR decode {B}x{L} in {dt:.2f}s ({B / dt:.1f} seqs/sec; '
      f'{L - 1} positions, full-prefix forwards)')

# KV-cached variant (ar_sample_kv): same samples, single-token cached
# forwards
from svdd_tpu.models.autoregressive import ar_sample_kv
fn_kv = jax.jit(lambda v, k: ar_sample_kv(model, v, B, L, k))
x_kv = np.asarray(fn_kv(variables, jax.random.key(2)))
phase('KV compile + first decode done')
t0 = time.perf_counter()
x_kv = np.asarray(fn_kv(variables, jax.random.key(2)))
dt2 = time.perf_counter() - t0
# exact equality holds in f32 (tests/test_extras.py); under bf16 on
# TPU, reduction-order ulp differences flip near-tie argmaxes and the
# AR chain then diverges downstream — report agreement, don't assert
agree = float((x_kv == x).mean())
assert x_kv.shape == x.shape and len(np.unique(x_kv)) > 1
phase(f'KV-cached AR decode {B}x{L} in {dt2:.2f}s '
      f'({B / dt2:.1f} seqs/sec — {dt / dt2:.1f}x the uncached loop; '
      f'bf16 token agreement {agree:.3f})')
