"""Bisect the B>64 train-step LLO 'CouldLeS32' compiler crash.

Each stage isolates one suspect of the backward pass at B=128 (the
forward-only decode at B*M=2560 is fine, so the bug is in a transposed
op). Run stages individually via argv to survive hard crashes:
    python scripts/probe_train_b128.py conv128 cnn full ...
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
B = int(os.environ.get('PROBE_B', '128'))


def phase(m):
  print(f'+{time.perf_counter()-T0:7.1f}s {m}', flush=True)


def run(name, fn):
  try:
    fn()
    phase(f'{name}: OK')
  except Exception as e:
    phase(f'{name}: FAILED {type(e).__name__}: {str(e)[:200]}')


stages = sys.argv[1:] or ['conv', 'convd64', 'cnn', 'loss', 'full']

from svdd_tpu.config import dna_config
from svdd_tpu.diffusion import Diffusion
from svdd_tpu.ops.conv1d import conv1d_shifted

L, C = 200, 128

if 'conv' in stages:
  # grad through one shifted conv at train scale, dilation 1
  k = jnp.ones((9, C, C), jnp.float32) * 0.01
  x = jnp.ones((B, L, C))
  g = jax.jit(jax.grad(
      lambda kk: conv1d_shifted(x, kk, None, dilation=1).sum()))
  run(f'grad conv1d_shifted B={B} dil=1', lambda: np.asarray(g(k)))

if 'convd64' in stages:
  k = jnp.ones((9, C, C), jnp.float32) * 0.01
  x = jnp.ones((B, L, C))
  g = jax.jit(jax.grad(
      lambda kk: conv1d_shifted(x, kk, None, dilation=64).sum()))
  run(f'grad conv1d_shifted B={B} dil=64', lambda: np.asarray(g(k)))

cfg = dna_config()
model = Diffusion(cfg, rng=jax.random.key(0))
x0 = jnp.zeros((B, cfg.model.length), jnp.int32)

if 'cnn' in stages:
  def loss_fwd(params):
    variables = {'params': params,
                 **{k: v for k, v in model.variables.items()
                    if k != 'params'}}
    out = model.forward(variables, x0, jnp.zeros((B,)))
    return out.sum()
  g = jax.jit(jax.grad(loss_fwd))
  run(f'grad CNN forward B={B}',
      lambda: np.asarray(jax.tree.leaves(g(model.variables['params']))[0]))

if 'loss' in stages:
  def loss_full(params):
    variables = {'params': params,
                 **{k: v for k, v in model.variables.items()
                    if k != 'params'}}
    return model.loss(variables, jax.random.key(0), x0).loss
  g = jax.jit(jax.grad(loss_full))
  run(f'grad full diffusion loss B={B}',
      lambda: np.asarray(jax.tree.leaves(g(model.variables['params']))[0]))

if 'full' in stages:
  from svdd_tpu.train import diffusion as train_diff
  trainer = train_diff.Trainer(model, cfg)
  state = trainer.init_or_restore(jax.random.key(1))
  batch = {'seqs': x0,
           'attention_mask': jnp.ones((B, cfg.model.length))}
  def step():
    s, loss = trainer.train_step(state, batch)
    np.asarray(loss)
    phase(f'loss {float(loss):.3f}')
  run(f'full train step B={B}', step)
