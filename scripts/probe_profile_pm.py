"""Profile one SVDD-PM (Tweedie) guided decode on TPU (jax.profiler)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault('SVDD_CNN_BF16', '1')

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

from svdd_tpu.config import dna_config
from svdd_tpu.diffusion import Diffusion
from svdd_tpu.models.enformer import EnformerValueModel

cfg = dna_config()
cfg.sampling.steps = 16
model = Diffusion(cfg, rng=jax.random.key(0))
vm = EnformerValueModel(n_tasks=1, compute_dtype=jnp.bfloat16)
vv = jax.jit(vm.init)(jax.random.key(1), jnp.zeros((1, 200, 4)))


def reward_apply(variables, onehot):
  return vm.apply(variables, onehot)


B = int(os.environ.get('PM_B', '512'))
STEPS = 16
s = model.tweedie_sampler((reward_apply, vv), B, sample_M=10,
                          num_steps=STEPS)
import time
t0 = time.perf_counter()
np.asarray(s(jax.random.key(0)).samples)   # compile + warm
print(f'warm in {time.perf_counter()-t0:.1f}s, timing...', flush=True)

t0 = time.perf_counter()
for i in range(3):
  out = s(jax.random.fold_in(jax.random.key(0), i)).samples
np.asarray(out)
dt = (time.perf_counter() - t0) / 3
print(f'{STEPS}-step decode: {dt:.3f}s = {dt/STEPS*1e3:.1f} ms/step '
      f'-> extrapolated {B/(dt/STEPS*128):.1f} seqs/s @128 steps',
      flush=True)

jax.profiler.start_trace('/tmp/jax_trace_pm')
np.asarray(s(jax.random.key(1)).samples)
jax.profiler.stop_trace()
print('trace done', flush=True)

for root, dirs, files in os.walk('/tmp/jax_trace_pm'):
  for f in files:
    p = os.path.join(root, f)
    print(p, os.path.getsize(p), flush=True)
