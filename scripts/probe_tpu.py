"""TPU compile/runtime bisection probe (diagnostic).

All model weights are jit ARGUMENTS (never closure constants) — the
constant-inlined form broke the remote compiler (multi-minute compiles,
then a broken-pipe transport failure uploading ~400MB of inlined
Enformer weights).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)

T0 = time.perf_counter()


def phase(m):
  print(f'+{time.perf_counter()-T0:7.1f}s {m}', flush=True)


phase(f'devices {jax.devices()}')
x = jnp.ones((1024, 1024), jnp.bfloat16)
jax.jit(lambda a: a @ a)(x).block_until_ready()
phase('matmul compiled+run')

from svdd_tpu.config import dna_config
from svdd_tpu.diffusion import Diffusion
cfg = dna_config()
model = Diffusion(cfg, rng=jax.random.key(0))
jax.block_until_ready(model.variables)
phase('CNN init (jitted)')

fwd = jax.jit(model.forward)
xx = jnp.zeros((256, 200), jnp.int32)
fwd(model.variables, xx, jnp.zeros((256,))).block_until_ready()
phase('CNN denoise fwd (B=256) compiled+run')
t = time.perf_counter()
fwd(model.variables, xx, jnp.zeros((256,))).block_until_ready()
phase(f'CNN fwd warm: {time.perf_counter()-t:.3f}s')

from svdd_tpu.models.enformer import EnformerValueModel
vm = EnformerValueModel(n_tasks=1, compute_dtype=jnp.bfloat16)
vv = jax.jit(vm.init)(jax.random.key(1), jnp.zeros((1, 200, 4)))
jax.block_until_ready(vv)
phase('Enformer init (jitted)')

vapply = jax.jit(vm.apply)
big = jnp.zeros((2560, 200, 4), jnp.bfloat16)
vapply(vv, big).block_until_ready()
phase('Enformer value fwd (B=2560) compiled+run')
t = time.perf_counter()
vapply(vv, jnp.ones((2560, 200, 4), jnp.bfloat16)).block_until_ready()
phase(f'Enformer fwd warm: {time.perf_counter()-t:.3f}s')

from svdd_tpu import mdlm


def value_apply(variables, tokens):
  return vm.apply(variables, mdlm.transform_samples(tokens))


s8 = model.controlled_sampler((value_apply, vv), 256, sample_M=10,
                              num_steps=8)
s8(jax.random.key(0)).samples.block_until_ready()
phase('8-step guided scan compiled+run')
t = time.perf_counter()
s8(jax.random.key(1)).samples.block_until_ready()
phase(f'8-step guided scan warm: {time.perf_counter()-t:.3f}s')
