"""Mosaic dot throughput at the exact value-tower conv shapes.

probe_mosaic_dot2.py showed the Mosaic bf16 dot ceiling lifted from
the r1 115-122 to 145-151 TFLOP/s (XLA same harness: 164). This probe
checks the ceiling AT the tower conv shapes (M = N*lh huge, K = k*cin,
N = cout) to decide whether fusing the conv dots into the LNC mega
kernels (killing the ~8.4 GB/step im2col HBM round-trip) wins.

Anti-CSE design (v1 of this probe was invalidated by XLA merging 12
identical dots into one): each chain step scales x by a distinct
traced scalar before the dot (a bf16 operand-read fusion, measured
free), and reduces the dot output to a scalar immediately (so the
(M, cout) product is read once, not accumulated 12x in f32).
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

CHAIN = 8
NROWS = 5120

SHAPES = [
    ('conv_1', 100, 3840, 768),
    ('conv_2', 50, 3840, 896),
    ('conv_3', 25, 4480, 1024),
    ('conv_6', 4, 6400, 1536),
]


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


def bench(fn, *args, iters=5):
  o = fn(*args)
  np.asarray(o)
  t0 = time.perf_counter()
  for _ in range(iters):
    o = fn(*args)
  np.asarray(o)
  return (time.perf_counter() - t0) / iters / CHAIN


def chain_sum(dot, x, w, scales):
  acc = jnp.float32(0.0)
  for i in range(CHAIN):
    # distinct operand per step (anti-CSE); the scale fuses into the
    # dot's bf16 operand read
    y = dot(x * scales[i], w)
    acc = acc + jnp.sum(y.astype(jnp.float32))
  return acc


for name, lh, kc, co in SHAPES:
  m = NROWS * lh
  key = jax.random.key(hash(name) % 2 ** 31)
  x = jax.random.normal(key, (m, kc), jnp.bfloat16) * 0.05
  w = jax.random.normal(jax.random.fold_in(key, 1), (kc, co),
                        jnp.bfloat16) * 0.05
  scales = (1.0 + jnp.arange(CHAIN, dtype=jnp.bfloat16)
            / (2.0 * CHAIN))
  flops = 2 * m * kc * co

  xla = jax.jit(functools.partial(chain_sum, jnp.dot))
  dt = bench(xla, x, w, scales)
  print(f'{name} ({m}x{kc}x{co}) XLA: {dt*1e3:.3f} ms/dot '
        f'{flops/dt/1e12:.1f} TF/s', flush=True)

  bm = 512
  bks = [d for d in range(1536, 383, -128) if kc % d == 0][:2]
  for bk in bks:
    bn = co if co <= 1024 else co // 2
    try:
      f = jax.jit(functools.partial(
          chain_sum,
          functools.partial(pallas_matmul, bm=bm, bn=bn, bk=bk)))
      dt = bench(f, x, w, scales)
      print(f'{name} Mosaic bm={bm} bn={bn} bk={bk}: '
            f'{dt*1e3:.3f} ms/dot {flops/dt/1e12:.1f} TF/s',
            flush=True)
    except Exception as e:  # noqa: BLE001
      print(f'{name} Mosaic bm={bm} bn={bn} bk={bk}: FAILED '
            f'{type(e).__name__}: {str(e)[:140]}', flush=True)
print('done')
