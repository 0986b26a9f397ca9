"""Bisect the TPU train-step compiler crash (llo CouldLeS32 check)."""
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


from svdd_tpu.config import rna_config
from svdd_tpu.diffusion import Diffusion
from svdd_tpu.ops.conv1d import conv1d_shifted

# 0. grad through a single shifted conv
k = jnp.ones((9, 16, 16), jnp.float32)
x = jnp.ones((8, 50, 16))


def f0(kk):
  return conv1d_shifted(x, kk, None, dilation=4).sum()


try:
  g = jax.jit(jax.grad(f0))(k)
  np.asarray(g)
  phase('grad through conv1d_shifted (dil=4): OK')
except Exception as e:
  phase(f'grad conv1d_shifted FAILED: {type(e).__name__}')

cfg = rna_config()
model = Diffusion(cfg, rng=jax.random.key(0))
x0 = jnp.zeros((16, cfg.model.length), jnp.int32)

# 1. grad of plain backbone forward
def loss_fwd(params):
  variables = {'params': params, **{k: v for k, v in
                                    model.variables.items()
                                    if k != 'params'}}
  out = model.forward(variables, x0, jnp.zeros((16,)))
  return out.sum()


try:
  g = jax.jit(jax.grad(loss_fwd))(model.variables['params'])
  np.asarray(jax.tree.leaves(g)[0])
  phase('grad of forward: OK')
except Exception as e:
  phase(f'grad of forward FAILED: {type(e).__name__}: {str(e)[:120]}')

# 2. grad of the full diffusion loss
def loss_full(params):
  variables = {'params': params, **{k: v for k, v in
                                    model.variables.items()
                                    if k != 'params'}}
  return model.loss(variables, jax.random.key(0), x0).loss


try:
  g = jax.jit(jax.grad(loss_full))(model.variables['params'])
  np.asarray(jax.tree.leaves(g)[0])
  phase('grad of full loss: OK')
except Exception as e:
  phase(f'grad of full loss FAILED: {type(e).__name__}: {str(e)[:120]}')

# 3. the whole train step
from svdd_tpu.train import diffusion as train_diff
trainer = train_diff.Trainer(model, cfg)
state = trainer.init_or_restore(jax.random.key(1))
batch = {'seqs': x0, 'attention_mask': jnp.ones((16, cfg.model.length))}
try:
  state, loss = trainer.train_step(state, batch)
  np.asarray(loss)
  phase(f'full train step: OK (loss {float(loss):.3f})')
except Exception as e:
  phase(f'full train step FAILED: {type(e).__name__}: {str(e)[:120]}')
