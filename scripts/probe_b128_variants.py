"""Probe workarounds for the B=128 CNN-backward LLO compiler SIGILL.

Stage 'cnn' of probe_train_b128.py reproduces the crash: grad of the
composed 20-layer CNN at B=128 kills the remote compiler, while grads
of individual convs pass. Variants (one per argv token, run each in
its own process — a crash aborts the process):

  remat    — jax.checkpoint around every CNN layer body
  tap      — conv backward restructured: SVDD_CONV_TAP_BWD=1 forces the
             tap-accumulate formulation (no im2col concat transpose)
  b96/b72  — narrow the failing batch range
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

which = sys.argv[1] if len(sys.argv) > 1 else 'remat'
if which == 'remat':
  os.environ['SVDD_REMAT_CNN_LAYERS'] = '1'
B = {'b96': 96, 'b72': 72}.get(which, 128)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
T0 = time.perf_counter()

from svdd_tpu.config import dna_config
from svdd_tpu.diffusion import Diffusion

cfg = dna_config()
model = Diffusion(cfg, rng=jax.random.key(0))
x0 = jnp.zeros((B, cfg.model.length), jnp.int32)


def loss_fwd(params):
  variables = {'params': params,
               **{k: v for k, v in model.variables.items()
                  if k != 'params'}}
  out = model.forward(variables, x0, jnp.zeros((B,)))
  return out.sum()


if which != 'accum':
  g = jax.jit(jax.grad(loss_fwd))
  try:
    np.asarray(jax.tree.leaves(g(model.variables['params']))[0])
    print(f'+{time.perf_counter()-T0:7.1f}s variant={which} B={B}: OK',
          flush=True)
  except Exception as e:
    print(f'+{time.perf_counter()-T0:7.1f}s variant={which} B={B}: '
          f'FAILED {type(e).__name__}: {str(e)[:160]}', flush=True)


if which == 'accum':
  # full train step, B=128 split into 2x64 microbatches
  import copy
  from svdd_tpu.train import diffusion as train_diff
  c2 = copy.deepcopy(cfg)
  c2.training.accum_steps = 2
  m2 = Diffusion(c2, rng=jax.random.key(0))
  trainer = train_diff.Trainer(m2, c2)
  state = trainer.init_or_restore(jax.random.key(1))
  batch = {'seqs': x0,
           'attention_mask': jnp.ones((B, c2.model.length))}
  try:
    state, loss = trainer.train_step(state, batch)
    np.asarray(loss)
    print(f'+{time.perf_counter()-T0:7.1f}s accum=2 train step B={B}: '
          f'OK (loss {float(loss):.3f})', flush=True)
  except Exception as e:
    print(f'+{time.perf_counter()-T0:7.1f}s accum=2 train step B={B}: '
          f'FAILED {type(e).__name__}: {str(e)[:160]}', flush=True)
