"""Per-component decode timing + Pallas sampler kernel validation on TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)

T0 = time.perf_counter()


def phase(m):
  print(f'+{time.perf_counter()-T0:7.1f}s {m}', flush=True)


def timed(fn, *args, n=3):
  np.asarray(jax.tree.leaves(fn(*args))[0])   # warm
  t = time.perf_counter()
  for _ in range(n):
    out = fn(*args)
  np.asarray(jax.tree.leaves(out)[0])
  return (time.perf_counter() - t) / n


# 1. Pallas fused gumbel-candidates kernel on real TPU
from svdd_tpu.ops import fused_sample as fs
log_q = jnp.log(jnp.broadcast_to(
    jnp.array([0.1, 0.2, 0.3, 0.4, 1e-9]), (256, 200, 5)))
x = jnp.full((256, 200), 4, jnp.int32).at[:, 0].set(2)
try:
  out = np.asarray(fs.gumbel_candidates_pallas(
      jnp.asarray(7), log_q, x, repeats=10, mask_index=4))
  freqs = np.bincount(out[:, :, 1:].reshape(-1), minlength=5) / \
      out[:, :, 1:].size
  ok = (abs(freqs[:4] - [0.1, 0.2, 0.3, 0.4]) < 0.02).all() \
      and (out[:, :, 0] == 2).all() and freqs[4] == 0
  phase(f'pallas gumbel kernel: freqs={np.round(freqs, 3)} '
        f'copy_ok={bool((out[:, :, 0] == 2).all())} -> '
        f'{"PASS" if ok else "FAIL"}')
except Exception as e:
  phase(f'pallas gumbel kernel FAILED: {type(e).__name__}: {e}')

# 2. decode component timings
from svdd_tpu.config import dna_config
from svdd_tpu.diffusion import Diffusion
from svdd_tpu.models.enformer import EnformerValueModel
from svdd_tpu import mdlm

cfg = dna_config()
model = Diffusion(cfg, rng=jax.random.key(0))
vm = EnformerValueModel(n_tasks=1, compute_dtype=jnp.bfloat16)
vv = jax.jit(vm.init)(jax.random.key(1), jnp.zeros((1, 200, 4)))
phase('models ready')


def value_apply(variables, tokens):
  return vm.apply(variables, mdlm.transform_samples(tokens))


# uncontrolled decode (no value net) per-step cost
s_unc = model.sampler(256, num_steps=16)
dt = timed(lambda k: s_unc(k).samples, jax.random.key(0), n=2)
phase(f'uncontrolled 16-step decode: {dt:.3f}s ({dt/16*1e3:.1f} ms/step)')

# guided M=1
s_m1 = model.controlled_sampler((value_apply, vv), 256, sample_M=1,
                                num_steps=16)
dt = timed(lambda k: s_m1(k).samples, jax.random.key(0), n=2)
phase(f'guided M=1 16-step decode: {dt:.3f}s ({dt/16*1e3:.1f} ms/step)')

# guided M=10
s_m10 = model.controlled_sampler((value_apply, vv), 256, sample_M=10,
                                 num_steps=16)
dt = timed(lambda k: s_m10(k).samples, jax.random.key(0), n=2)
phase(f'guided M=10 16-step decode: {dt:.3f}s ({dt/16*1e3:.1f} ms/step)')
