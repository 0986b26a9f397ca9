"""Mosaic feasibility + timing probe for a fused attention-pool kernel.

Variants (all take x, logits (n, l, c) -> pooled (n, l/2, c)):
  A: in-kernel reshape (tn,l,c)->(tn,l/2,2,c), softmax over dim 2
  B: in-kernel shift/blend full-length, strided-slice write [::2]
  C: in-kernel reshape (tn,l,c)->(tn,l/2,2c), lane-slice halves
  D: shift/blend full-length + loop-of-dots downsample
  E: XLA baseline (current blocks.py grouped-softmax form)
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

N, L, C = 2560, 200, 768
TN = 32
NEG = -1e30


def ref(x, logits):
  b, n, c = x.shape
  xg = x.reshape(b, -1, 2, c)
  lg = logits.reshape(b, -1, 2, c)
  attn = jax.nn.softmax(lg.astype(jnp.float32), axis=2).astype(x.dtype)
  return (xg * attn).sum(axis=2)


def kernel_a(x_ref, l_ref, o_ref):
  x = x_ref[:]
  tn, l, c = x.shape
  xg = x.reshape(tn, l // 2, 2, c)
  lg = l_ref[:].astype(jnp.float32).reshape(tn, l // 2, 2, c)
  m = jnp.max(lg, axis=2, keepdims=True)
  e = jnp.exp(lg - m)
  o_ref[:] = ((xg.astype(jnp.float32) * e).sum(2)
              / e.sum(2)).astype(x.dtype)


def _blend_full(x, lg):
  tn, l, c = x.shape
  ls = jnp.pad(lg[:, 1:, :], ((0, 0), (0, 1), (0, 0)),
               constant_values=NEG)
  xs = jnp.pad(x[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
  m = jnp.maximum(lg, ls)
  e0 = jnp.exp(lg - m)
  e1 = jnp.exp(ls - m)
  return ((x.astype(jnp.float32) * e0 + xs.astype(jnp.float32) * e1)
          / (e0 + e1))


def kernel_b(x_ref, l_ref, o_ref):
  x = x_ref[:]
  r = _blend_full(x, l_ref[:].astype(jnp.float32))
  o_ref[:] = r[:, ::2, :].astype(x.dtype)


def kernel_c(x_ref, l_ref, o_ref):
  x = x_ref[:]
  tn, l, c = x.shape
  xw = x.reshape(tn, l // 2, 2 * c)
  lw = l_ref[:].astype(jnp.float32).reshape(tn, l // 2, 2 * c)
  x0, x1 = xw[..., :c].astype(jnp.float32), xw[..., c:].astype(jnp.float32)
  l0, l1 = lw[..., :c], lw[..., c:]
  w = jax.nn.sigmoid(l0 - l1)
  o_ref[:] = (x1 + (x0 - x1) * w).astype(x.dtype)


def kernel_d(x_ref, l_ref, sel_ref, o_ref):
  x = x_ref[:]
  tn, l, c = x.shape
  r = _blend_full(x, l_ref[:].astype(jnp.float32)).astype(x.dtype)
  sel = sel_ref[:]          # (l/2, l) one-hot rows at even positions
  outs = [
      jax.lax.dot_general(sel, r[t], (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
      for t in range(tn)]
  o_ref[:] = jnp.stack(outs).astype(x.dtype)


def build(variant):
  grid = (N // TN,)
  in_specs = [
      pl.BlockSpec((TN, L, C), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM),
      pl.BlockSpec((TN, L, C), lambda i: (i, 0, 0),
                   memory_space=pltpu.VMEM),
  ]
  args = []
  if variant == 'd':
    sel = np.zeros((L // 2, L), np.float32)
    sel[np.arange(L // 2), np.arange(0, L, 2)] = 1.0
    args = [jnp.asarray(sel, jnp.bfloat16)]
    in_specs.append(pl.BlockSpec((L // 2, L), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM))
  kern = dict(a=kernel_a, b=kernel_b, c=kernel_c, d=kernel_d)[variant]

  @jax.jit
  def run(x, logits):
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((TN, L // 2, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, L // 2, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(x, logits, *args)
  return run


key = jax.random.key(0)
x = jax.random.normal(key, (N, L, C), jnp.bfloat16)
logits = 2.0 * x + jax.random.normal(jax.random.key(1), (N, L, C),
                                     jnp.bfloat16)

want = np.asarray(jax.jit(ref)(x, logits))


def timeit(fn, n=10):
  np.asarray(fn(x, logits))
  t = time.perf_counter()
  for _ in range(n):
    out = fn(x, logits)
  np.asarray(out)
  return (time.perf_counter() - t) / n * 1e3


e_ms = timeit(jax.jit(ref))
print(f'E xla-baseline: {e_ms:7.3f} ms', flush=True)

for v in 'abcd':
  try:
    fn = build(v)
    got = np.asarray(fn(x, logits))
    err = np.abs(got.astype(np.float32) - want.astype(np.float32)).max()
    ms = timeit(fn)
    print(f'{v.upper()} pallas: {ms:7.3f} ms  maxerr={err:.4f}', flush=True)
  except Exception as ex:
    msg = str(ex).replace(chr(10), ' ')[:300]
    print(f'{v.upper()} pallas FAILED: {type(ex).__name__}: {msg}',
          flush=True)
