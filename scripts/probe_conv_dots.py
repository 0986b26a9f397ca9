"""Isolate the conv-matmul efficiency gap (trace r2: conv_2..4 run at
141-158 TF/s vs the 187-194 ceiling while conv_1/5/6 hit 170-190).

Times each tower conv dot standalone from (a) plain device arrays,
(b) a 2D-collapsed view, (c) lh padded to a multiple of 8. If (a)
reproduces the trace numbers the gap is intrinsic to the shape (not
the Pallas producer's layout); if (b)/(c) fix it, reshape in conv1d.
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
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)

# (name, lh, k_cin, c_out) from the r2-final trace
SHAPES = [
    ('conv_1', 100, 3840, 768),
    ('conv_2', 50, 3840, 896),
    ('conv_3', 25, 4480, 1024),
    ('conv_4', 13, 5120, 1152),
    ('conv_5', 7, 5760, 1280),
    ('conv_6', 4, 6400, 1536),
]
N = 5120


def timeit(name, fn, *args, iters=20):
  red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
  s = float(red(*args))
  t0 = time.perf_counter()
  for _ in range(iters):
    s = red(*args)
  s = float(s)
  dt = (time.perf_counter() - t0) / iters * 1e3
  return dt


for name, lh, kc, co in SHAPES:
  key = jax.random.key(hash(name) % 2 ** 31)
  cols = jax.random.normal(key, (N, lh, kc), jnp.bfloat16) * 0.05
  w = jax.random.normal(jax.random.fold_in(key, 1), (kc, co),
                        jnp.bfloat16) * 0.05
  flops = 2 * N * lh * kc * co
  sum_ms_est = (N * lh * co * 4) / 819e9 * 1e3   # f32 read for the sum

  def dot3(cols, w):
    return jnp.dot(cols, w,
                   preferred_element_type=jnp.float32).astype(cols.dtype)

  def dot2(cols, w):
    o = jnp.dot(cols.reshape(-1, cols.shape[-1]), w,
                preferred_element_type=jnp.float32).astype(cols.dtype)
    return o.reshape(cols.shape[0], cols.shape[1], -1)

  lh_pad = -(-lh // 8) * 8

  def dot3p(cols, w):
    cp = jnp.pad(cols, ((0, 0), (0, lh_pad - lh), (0, 0)))
    o = jnp.dot(cp, w,
                preferred_element_type=jnp.float32).astype(cols.dtype)
    return o[:, :lh]

  for tag, fn in (('3d', dot3), ('2d', dot2), ('pad8', dot3p)):
    try:
      dt = timeit(f'{name}-{tag}', fn, cols, w)
      tf = flops / ((dt - sum_ms_est) * 1e-3) / 1e12
      print(f'{name} {tag:5s} {dt:7.3f} ms  ~{tf:6.1f} TF/s '
            f'(sum pass ~{sum_ms_est:.2f} ms excluded)', flush=True)
    except Exception as e:                              # noqa: BLE001
      print(f'{name} {tag:5s} FAILED {type(e).__name__}: {e}',
            flush=True)
