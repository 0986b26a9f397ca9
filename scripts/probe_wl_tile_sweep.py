"""Sweep w-logits mega-kernel tile sizes per tower-block shape, then
the conv-dot layout variants (probe_conv_dots inline) — one TPU
process, sequential.

Output feeds a measured per-shape tile table for
_pick_tile_n_wl_mega (r2: stem best at tile 16, block-1 regressed at
32 — the optimum is not a pure rows-per-tile rule).
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

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from svdd_tpu.ops import attn_pool_pallas as ap
from svdd_tpu.ops.kernel_utils import live_offsets

N = 5120
ACT = 'gelu_enformer'
# (name, L_in_padded_even, C_in) per tower pool feeding a k=5 conv
BLOCKS = [
    ('stem', 200, 768),
    ('b1', 100, 768),
    ('b2', 50, 896),
    ('b3', 26, 1024),
    ('b4', 14, 1152),
    ('b5', 8, 1280),
]


def build(l, c, tile_n):
  offsets = tuple(live_offsets(5, l // 2))
  k_live = len(offsets)
  body = functools.partial(ap._wl_mega_kernel, offsets=offsets,
                           act=ACT, mask_tail=False)

  @jax.jit
  def run(x, w, scale, shift):
    return pl.pallas_call(
        body,
        grid=(N // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, l, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, l // 2, k_live * c),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, l // 2, k_live * c),
                                       x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=N * l * c * c + 12 * N * l * c,
            bytes_accessed=x.size * 2 + N * (l // 2) * k_live * c * 2,
            transcendentals=N * l * c),
    )(x, w.astype(x.dtype), scale.reshape(1, c), shift.reshape(1, c))

  return run


for name, l, c in BLOCKS:
  key = jax.random.key(abs(hash(name)) % 2 ** 31)
  x = jax.random.normal(key, (N, l, c), jnp.bfloat16)
  w = jax.random.normal(jax.random.fold_in(key, 1), (c, c),
                        jnp.float32) * 0.2
  scale = jnp.ones((c,), jnp.float32)
  shift = jnp.zeros((c,), jnp.float32)
  k_live = len(live_offsets(5, l // 2))
  sum_ms = (N * (l // 2) * k_live * c * 4) / 819e9 * 1e3
  for tile in (8, 16, 32, 64, 128):
    if N % tile:
      continue
    rows = tile * l * c
    if rows > 4 * 2 ** 20:          # VMEM ceiling (measured: 2.46M ok)
      continue
    fn = build(l, c, tile)
    red = jax.jit(lambda x, w, s, t, fn=fn: jnp.sum(
        fn(x, w, s, t).astype(jnp.float32)))
    try:
      float(red(x, w, scale, shift))
      t0 = time.perf_counter()
      for _ in range(20):
        s = red(x, w, scale, shift)
      float(s)
      dt = (time.perf_counter() - t0) / 20 * 1e3
      print(f'{name} l={l} c={c} tile={tile:3d}: {dt:7.3f} ms '
            f'(~{dt - sum_ms:.3f} kernel, sum {sum_ms:.2f})',
            flush=True)
    except Exception as e:                              # noqa: BLE001
      print(f'{name} tile={tile}: FAILED {type(e).__name__}', flush=True)

print('--- conv dot variants ---', flush=True)
SHAPES = [
    ('conv_1', 100, 3840, 768),
    ('conv_2', 50, 3840, 896),
    ('conv_3', 25, 4480, 1024),
    ('conv_4', 13, 5120, 1152),
    ('conv_5', 7, 5760, 1280),
    ('conv_6', 4, 6400, 1536),
]
for name, lh, kc, co in SHAPES:
  key = jax.random.key(abs(hash(name)) % 2 ** 31)
  cols = jax.random.normal(key, (N, lh, kc), jnp.bfloat16) * 0.05
  w = jax.random.normal(jax.random.fold_in(key, 1), (kc, co),
                        jnp.bfloat16) * 0.05
  flops = 2 * N * lh * kc * co
  sum_ms = (N * lh * co * 4) / 819e9 * 1e3

  def dot3(cols, w):
    return jnp.dot(cols, w,
                   preferred_element_type=jnp.float32).astype(cols.dtype)

  def dot2(cols, w):
    o = jnp.dot(cols.reshape(-1, cols.shape[-1]), w,
                preferred_element_type=jnp.float32).astype(cols.dtype)
    return o.reshape(cols.shape[0], cols.shape[1], -1)

  for tag, fn in (('3d', dot3), ('2d', dot2)):
    red = jax.jit(lambda c_, w_, fn=fn: jnp.sum(
        fn(c_, w_).astype(jnp.float32)))
    try:
      float(red(cols, w))
      t0 = time.perf_counter()
      for _ in range(20):
        s = red(cols, w)
      float(s)
      dt = (time.perf_counter() - t0) / 20 * 1e3
      tf = flops / ((dt - sum_ms) * 1e-3) / 1e12
      print(f'{name} {tag}: {dt:7.3f} ms  ~{tf:6.1f} TF/s '
            f'(sum {sum_ms:.2f} excl)', flush=True)
    except Exception as e:                              # noqa: BLE001
      print(f'{name} {tag}: FAILED {type(e).__name__}', flush=True)
