"""Retest the Mosaic (Pallas) bf16 dot ceiling vs XLA on this runtime.

r1 ground truth (CLAUDE.md): Mosaic dots plateau at 115-122 TFLOP/s
while XLA bf16 matmuls hit 187-194 on the same chip — which is why
every conv dot stays in XLA and Pallas only owns bandwidth chains.
If a runtime update lifted the Mosaic ceiling to ~XLA parity, fusing
the tower conv dots INTO the mega kernels becomes worthwhile
(~15 ms/step at stake, TODO.md "round-3 items").

Run:  timeout 1200 python scripts/probe_mosaic_dot.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)

print('devices:', jax.devices(), flush=True)


def matmul_kernel(x_ref, w_ref, o_ref, acc_ref, *, nk):
  k = pl.program_id(2)

  @pl.when(k == 0)
  def _init():
    acc_ref[...] = jnp.zeros_like(acc_ref)

  acc_ref[...] += jnp.dot(
      x_ref[...], w_ref[...], preferred_element_type=jnp.float32)

  @pl.when(k == nk - 1)
  def _done():
    o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def pallas_matmul(x, w, bm, bn, bk):
  m, k = x.shape
  _, n = w.shape
  nk = k // bk
  kern = functools.partial(matmul_kernel, nk=nk)
  return pl.pallas_call(
      kern,
      grid=(m // bm, n // bn, nk),
      in_specs=[
          pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
          pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
      ],
      out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
      out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
      scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('parallel', 'parallel', 'arbitrary')),
  )(x, w)


def bench(fn, *args, iters=30):
  o = fn(*args)
  o.block_until_ready()
  import numpy as np
  np.asarray(o[:1, :1])  # force on axon
  t0 = time.perf_counter()
  for _ in range(iters):
    o = fn(*args)
  import numpy as np
  np.asarray(o[:1, :1])
  return (time.perf_counter() - t0) / iters


M, K, N = 4096, 4096, 4096
key = jax.random.key(0)
x = jax.random.normal(key, (M, K), jnp.bfloat16)
w = jax.random.normal(jax.random.fold_in(key, 1), (K, N), jnp.bfloat16)
flops = 2 * M * K * N

xla = jax.jit(lambda a, b: jnp.dot(a, b))
dt = bench(xla, x, w)
print(f'XLA bf16 {M}x{K}x{N}: {dt*1e3:.2f} ms, '
      f'{flops/dt/1e12:.1f} TFLOP/s', flush=True)

for bm, bn, bk in [(512, 512, 512), (1024, 512, 512), (512, 1024, 1024),
                   (256, 1024, 512), (1024, 1024, 512)]:
  try:
    f = jax.jit(functools.partial(pallas_matmul, bm=bm, bn=bn, bk=bk))
    dt = bench(f, x, w)
    print(f'Mosaic bm={bm} bn={bn} bk={bk}: {dt*1e3:.2f} ms, '
          f'{flops/dt/1e12:.1f} TFLOP/s', flush=True)
  except Exception as e:  # noqa: BLE001
    print(f'Mosaic bm={bm} bn={bn} bk={bk}: FAILED {type(e).__name__}: '
          f'{str(e)[:200]}', flush=True)
print('done')
