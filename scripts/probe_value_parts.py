"""Fine-grained value-net component timings at the flagship decode
shape (B*M=2560, L=200): where do the ~95 ms/step go?"""
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


def timed(fn, *args, n=5):
  np.asarray(jax.tree.leaves(fn(*args))[0])   # warm/compile
  t = time.perf_counter()
  for _ in range(n):
    out = fn(*args)
  np.asarray(jax.tree.leaves(out)[0])
  return (time.perf_counter() - t) / n


from svdd_tpu.models.enformer import (EnformerValueModel, EnformerTrunk,
                                      EnformerConvTower,
                                      EnformerTransformerBlock)
from svdd_tpu.models import blocks

N, L = 2560, 200
DT = jnp.bfloat16
onehot = jnp.zeros((N, L, 4), DT)

# 1. full value model
vm = EnformerValueModel(n_tasks=1, compute_dtype=DT)
vv = jax.jit(vm.init)(jax.random.key(0), jnp.zeros((1, L, 4)))
f = jax.jit(lambda v, x: vm.apply(v, x))
dt = timed(f, vv, onehot)
phase(f'full value model: {dt*1e3:.1f} ms')

# 2. conv tower alone
ct = EnformerConvTower(n_blocks=7, out_channels=1536)
cv = jax.jit(ct.init)(jax.random.key(1), jnp.zeros((1, L, 4), DT))
fct = jax.jit(lambda v, x: ct.apply(v, x))
dt_ct = timed(fct, cv, onehot)
phase(f'conv tower alone: {dt_ct*1e3:.1f} ms')

# 3. transformer stack alone at the post-tower shape (N, 2, 1536)
x2 = jnp.zeros((N, 2, 1536), DT)


class Stack(jax.numpy.ndarray.__class__ if False else object):
  pass


import flax.linen as nn


class TStack(nn.Module):
  n: int = 11

  @nn.compact
  def __call__(self, x):
    class _Body(nn.Module):
      @nn.compact
      def __call__(self, carry, _):
        return EnformerTransformerBlock(in_len=1536)(carry), None
    scanner = nn.scan(_Body, variable_axes={'params': 0},
                      split_rngs={'params': True}, length=self.n)
    x, _ = scanner(name='stack')(x, None)
    return x


ts = TStack()
tv = jax.jit(ts.init)(jax.random.key(2), x2[:1])
fts = jax.jit(lambda v, x: ts.apply(v, x))
dt_ts = timed(fts, tv, x2)
phase(f'transformer stack (scan) alone: {dt_ts*1e3:.1f} ms')


class TUnrolled(nn.Module):
  n: int = 11

  @nn.compact
  def __call__(self, x):
    for i in range(self.n):
      x = EnformerTransformerBlock(in_len=1536, name=f'b{i}')(x)
    return x


tu = TUnrolled()
tuv = jax.jit(tu.init)(jax.random.key(2), x2[:1])
ftu = jax.jit(lambda v, x: tu.apply(v, x))
dt_tu = timed(ftu, tuv, x2)
phase(f'transformer stack (unrolled) alone: {dt_tu*1e3:.1f} ms')

# 4. a single attention-pool at stem size (N, 200, 768)
ap = blocks.AttentionPool(dim=768, pool_size=2)
xs = jnp.zeros((N, L, 768), DT)
av = jax.jit(ap.init)(jax.random.key(3), xs[:1])
fap = jax.jit(lambda v, x: ap.apply(v, x))
dt_ap = timed(fap, av, xs)
phase(f'stem attention-pool alone (N,200,768): {dt_ap*1e3:.1f} ms')

# 5. stem conv alone (15-tap 4->768)
from svdd_tpu.ops.conv1d import Conv1D
sc = Conv1D(768, 15, dtype=DT)
scv = jax.jit(sc.init)(jax.random.key(4), onehot[:1])
fsc = jax.jit(lambda v, x: sc.apply(v, x))
dt_sc = timed(fsc, scv, onehot)
phase(f'stem conv alone (15x4x768 @200): {dt_sc*1e3:.1f} ms')

# 6. k=5 conv at the biggest block shape (N, 100, 768->768)
c5 = Conv1D(768, 5, dtype=DT)
xc = jnp.zeros((N, 100, 768), DT)
c5v = jax.jit(c5.init)(jax.random.key(5), xc[:1])
fc5 = jax.jit(lambda v, x: c5.apply(v, x))
dt_c5 = timed(fc5, c5v, xc)
phase(f'k5 conv alone (768->768 @100): {dt_c5*1e3:.1f} ms')

# 7. pointwise 1536->3072 at L'=2
pw = Conv1D(3072, 1, dtype=DT)
xp = jnp.zeros((N, 2, 1536), DT)
pwv = jax.jit(pw.init)(jax.random.key(6), xp[:1])
fpw = jax.jit(lambda v, x: pw.apply(v, x))
dt_pw = timed(fpw, pwv, xp)
phase(f'pointwise conv alone (1536->3072 @2): {dt_pw*1e3:.1f} ms')
