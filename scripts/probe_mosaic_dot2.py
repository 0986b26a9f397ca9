"""In-graph Mosaic vs XLA bf16 dot throughput (dispatch amortized).

probe_mosaic_dot.py showed both paths ~80-93 TFLOP/s at 4096^3 with
per-call timing — that's tunnel/dispatch overhead, not the MXU. Here
we chain CHAIN dependent matmuls inside ONE jit so the device does
CHAIN full dots back-to-back; per-dot time = total/CHAIN.

Decides whether the r1 Mosaic dot ceiling (115-122 vs XLA 187-194)
still holds on this runtime — gates fusing tower conv dots into the
mega kernels (TODO.md round-3 item, ~15 ms/step at stake).
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)

print('devices:', jax.devices(), flush=True)

CHAIN = 24
M = K = N = 4096


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


def chain(dot, x, w):
  y = x
  for _ in range(CHAIN):
    # dependent chain: each dot consumes the last one's output, so
    # the device must run them sequentially (honest per-dot time)
    y = dot(y, w)
  return y


def bench(fn, *args, iters=8):
  o = fn(*args)
  np.asarray(o[:1, :1])
  t0 = time.perf_counter()
  for _ in range(iters):
    o = fn(*args)
  np.asarray(o[:1, :1])
  return (time.perf_counter() - t0) / iters / CHAIN


key = jax.random.key(0)
x = (jax.random.normal(key, (M, K), jnp.bfloat16) * 0.02)
w = (jax.random.normal(jax.random.fold_in(key, 1), (K, N),
                       jnp.bfloat16) * 0.02)
flops = 2 * M * K * N

xla = jax.jit(functools.partial(chain, jnp.dot))
dt = bench(xla, x, w)
print(f'XLA bf16 {M}^3 x{CHAIN}-chain: {dt*1e3:.3f} ms/dot, '
      f'{flops/dt/1e12:.1f} TFLOP/s', flush=True)

for bm, bn, bk in [(512, 1024, 1024), (1024, 512, 512),
                   (512, 512, 1024), (1024, 1024, 1024)]:
  try:
    f = jax.jit(functools.partial(
        chain, functools.partial(pallas_matmul, bm=bm, bn=bn, bk=bk)))
    dt = bench(f, x, w)
    print(f'Mosaic bm={bm} bn={bn} bk={bk}: {dt*1e3:.3f} ms/dot, '
          f'{flops/dt/1e12:.1f} TFLOP/s', flush=True)
  except Exception as e:  # noqa: BLE001
    print(f'Mosaic bm={bm} bn={bn} bk={bk}: FAILED {type(e).__name__}: '
          f'{str(e)[:160]}', flush=True)
print('done')
