"""Microbench w-logits mega-kernel variants on the stem shape.

The r2 trace shows pool_prologue_im2col_wlogits_pallas.54 at 10.9 ms
(56 TF/s in-kernel dot; BW floor ~6.7 ms at 819 GB/s). Variants:
  base   — shipped kernel (tile picked by _pick_tile_n_wl_mega)
  tileN  — forced larger row tiles (the shipped VMEM estimate
           double-counts the f32 temps: they live on HALF rows)
  lean   — bf16 difference before the dot; blend keeps only x1+d f32
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
from svdd_tpu.ops.kernel_utils import act as _act, live_offsets

N, L, C, K = 5120, 200, 768, 5
ACT = 'gelu_enformer'

key = jax.random.key(0)
x = jax.random.normal(key, (N, L, C), jnp.bfloat16)
w = (jax.random.normal(jax.random.fold_in(key, 1), (C, C),
                       jnp.float32) * 0.2)
scale = jnp.ones((C,), jnp.float32)
shift = jnp.zeros((C,), jnp.float32)


def lean_kernel(x_ref, w_ref, s_ref, t_ref, o_ref, *, offsets, act):
  xx = x_ref[:]
  tn, l, c = xx.shape
  lh = l // 2
  xw = xx.reshape(tn, lh, 2 * c)
  x1 = xw[..., c:]
  d = xw[..., :c] - x1                      # bf16 difference
  ld = jax.lax.dot_general(
      d.reshape(tn * lh, c), w_ref[:], (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32).reshape(tn, lh, c)
  wgt = jax.nn.sigmoid(ld)
  pooled = x1.astype(jnp.float32) + d.astype(jnp.float32) * wgt
  xg = _act(act, pooled * s_ref[0][None, None, :]
            + t_ref[0][None, None, :]).astype(xx.dtype)
  for j, off in enumerate(offsets):
    if off >= 0:
      seg = jnp.pad(xg[:, off:, :], ((0, 0), (0, off), (0, 0)))
    else:
      seg = jnp.pad(xg[:, :lh + off, :], ((0, 0), (-off, 0), (0, 0)))
    o_ref[:, :, j * c:(j + 1) * c] = seg


def build(kernel_body, tile_n):
  offsets = tuple(live_offsets(K, L // 2))
  k_live = len(offsets)
  body = functools.partial(kernel_body, offsets=offsets, act=ACT)

  @jax.jit
  def run(x, w, scale, shift):
    return pl.pallas_call(
        body,
        grid=(N // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, L, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, L // 2, k_live * C),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L // 2, k_live * C),
                                       x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=N * L * C * C + 12 * N * L * C,
            bytes_accessed=x.size * 2 + N * (L // 2) * k_live * C * 2,
            transcendentals=N * L * C),
    )(x, w.astype(x.dtype), scale.reshape(1, C), shift.reshape(1, C))

  return run


def timeit(name, fn, iters=30, fetch_out=False):
  # NEVER fetch the 3.9 GB cols through the tunnel while timing: sum
  # to a scalar inside jit (same ~5 ms device read pass per variant)
  red = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
  try:
    s = float(red(x, w, scale, shift))    # compile+warm
    t0 = time.perf_counter()
    for _ in range(iters):
      s = red(x, w, scale, shift)
    s = float(s)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f'{name:28s} {dt:7.2f} ms   (sum {s:.3e})', flush=True)
    return fn(x, w, scale, shift) if fetch_out else True
  except Exception as e:                                # noqa: BLE001
    print(f'{name:28s} FAILED {type(e).__name__}: {e}', flush=True)
    return None


# correctness pin for the lean variant (vs shipped reference)
want = ap.pool_prologue_im2col_wlogits_reference(
    x[:8].astype(jnp.float32), w, scale, shift, K, ACT, False)

def shipped_body(x_ref, w_ref, s_ref, t_ref, o_ref, *, offsets, act):
  return ap._wl_mega_kernel(x_ref, w_ref, s_ref, t_ref, o_ref,
                            offsets=offsets, act=act, mask_tail=False)


timeit('base (shipped dispatch)',
       lambda x, w, s, t: ap.pool_prologue_im2col_wlogits_pallas(
           x, w, s, t, K, ACT, False))
for tn in (16,):
  timeit(f'shipped-kernel tile={tn}', build(shipped_body, tn))
for tn in (8, 16, 32):
  got = timeit(f'lean tile={tn}', build(lean_kernel, tn),
               fetch_out=(tn == 8))
  if got is not None and got is not True and tn == 8:
    np.testing.assert_allclose(
        np.asarray(got[:8], dtype=np.float32), np.asarray(want),
        atol=3e-2, rtol=3e-2)
    print('lean matches reference', flush=True)
