"""Isolate the LNC mega-kernel bandwidth gap (650 vs 819 GB/s peak).

The pool+affine+act+im2col mega kernels (attn_pool_pallas LNC) run at
642-658 GB/s — ~80% of HBM peak — and are the last big off-roofline
bucket (~23.6 ms/step). This probe separates DMA-pattern cost from
compute serialization at the conv_1 mega shape by timing:

  a. the REAL kernel (pool blend + affine + gelu + 5-slab emission)
  b. the real kernel with act=None (no gelu transcendentals)
  c. a pure-copy kernel with the SAME block shapes + shifted-slab
     emission pattern (no blend/affine math at all)
  d. a pure-copy kernel writing the output block in ONE straight
     store (no per-tap shifted slices)

If (c)/(d) also sit at ~650 GB/s the gap is DMA/layout-intrinsic; if
they reach ~800 the kernel's VPU work is serializing with the DMA.
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

from svdd_tpu.ops import attn_pool_pallas as app

print('devices:', jax.devices(), flush=True)

# conv_1 mega shape (trace r2: 11.01 ms @ 643 GB/s)
L, N, C = 200, 5120, 768
K_TAPS = 5
LH = L // 2
key = jax.random.key(0)
x = jax.random.normal(key, (L, N, C), jnp.bfloat16) * 0.1
res = jax.random.normal(jax.random.fold_in(key, 1), (L, N, C),
                        jnp.bfloat16) * 0.1
w = jax.random.normal(jax.random.fold_in(key, 2), (C, C),
                      jnp.bfloat16) * 0.02
scale = jnp.ones((C,), jnp.float32)
shift = jnp.zeros((C,), jnp.float32)

offsets = tuple(app._live_offsets(K_TAPS, LH))
K_LIVE = len(offsets)
BYTES = (2 * x.size * 2) + LH * N * K_LIVE * C * 2   # in+res+out


def bench(fn, *args, iters=10):
  o = fn(*args)
  np.asarray(o[:1, :1, :1])
  t0 = time.perf_counter()
  for _ in range(iters):
    o = fn(*args)
  np.asarray(o[:1, :1, :1])
  return (time.perf_counter() - t0) / iters


def report(name, dt, nbytes=BYTES):
  print(f'{name}: {dt*1e3:.2f} ms, {nbytes/dt/1e9:.0f} GB/s',
        flush=True)


# a. the real kernel (gelu act, residual)
f = jax.jit(functools.partial(
    app.pool_prologue_im2col_wlogits_lnc_pallas, k_taps=K_TAPS,
    act='gelu_enformer', mask_tail=False))
report('real (gelu)', bench(lambda: f(x, w, scale, shift,
                                      residual=res)))

# b. act=None
f2 = jax.jit(functools.partial(
    app.pool_prologue_im2col_wlogits_lnc_pallas, k_taps=K_TAPS,
    act=None, mask_tail=False))
report('real (act=None)', bench(lambda: f2(x, w, scale, shift,
                                           residual=res)))


def _copy_kernel(x_ref, r_ref, o_ref, *, straight):
  xx = x_ref[:] + r_ref[:]
  l, tn, c = xx.shape
  lh = l // 2
  # cheap stand-in for the pooled activation: the top half
  xg = xx[:lh]
  if straight:
    o_ref[:] = jnp.concatenate([xg] * K_LIVE, axis=-1)
    return
  for j, off in enumerate(offsets):
    lane = slice(j * c, (j + 1) * c)
    if off >= 0:
      o_ref[:lh - off, :, lane] = xg[off:]
      if off:
        o_ref[lh - off:lh, :, lane] = jnp.zeros((off, tn, c), xg.dtype)
    else:
      o_ref[-off:lh, :, lane] = xg[:lh + off]
      o_ref[:-off, :, lane] = jnp.zeros((-off, tn, c), xg.dtype)


def copy_pallas(x, res, tile_n, straight):
  body = functools.partial(_copy_kernel, straight=straight)
  xspec = pl.BlockSpec((L, tile_n, C), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM)
  return pl.pallas_call(
      body,
      grid=(N // tile_n,),
      in_specs=[xspec, xspec],
      out_specs=pl.BlockSpec((LH, tile_n, K_LIVE * C),
                             lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((LH, N, K_LIVE * C), x.dtype),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
  )(x, res)


tile_n = app._pick_tile_n_lnc(N, L, C, k_live=K_LIVE, has_res=True)
print('tile_n =', tile_n, flush=True)
for straight in (False, True):
  g = jax.jit(functools.partial(copy_pallas, tile_n=tile_n,
                                straight=straight))
  report(f'copy (straight={straight})', bench(lambda: g(x, res)))

# d2: straight copy with double tile_n if it fits
for tn2 in (tile_n * 2, tile_n * 4):
  if N % tn2 == 0:
    try:
      g = jax.jit(functools.partial(copy_pallas, tile_n=tn2,
                                    straight=False))
      report(f'copy shifted tile_n={tn2}', bench(lambda: g(x, res)))
    except Exception as e:  # noqa: BLE001
      print(f'tile_n={tn2} FAILED: {str(e)[:120]}', flush=True)
print('done')
