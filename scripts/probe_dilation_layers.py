"""Localize why the highest-dilation fused CNN layers run slower.

r3 PM roofline (TODO.md): the fused cnn_layer_pallas layers average
151.7 TF/s at the candidate-denoiser shape (5120, 200, 128), but the
4 highest-dilation layers run ~124.5 vs 157-160 for the rest. Two
suspects:

  (a) the shifted slab accumulate — d=64 shifts slabs by +-64/128/192
      sublane rows, d=1 by +-1..4;
  (b) wasted dot FLOPs — for tap offset o only l-|o| of the l output
      rows are used, so d=64 (offsets +-{64,128,192}) computes ~46%
      of its tap-dot rows only to discard them (d=1 wastes 1.5%).

This probe times, per dilation, three kernels with identical block
shapes at the PM candidate shape:

  full       — the production kernel (shifts + full-row dot)
  noshift    — same dot, slabs accumulated UNSHIFTED (isolates (a);
               output is numerically wrong on purpose)
  restricted — EXACT-math variant of the production kernel: taps with
               |offset| >= L/4 run as per-tap 3D dots on only the
               l-|o| contributing rows (isolates (b); bit-identical
               multiplies, so it is a shippable optimization if it
               wins)

Chained dependent calls inside one jit defeat CSE and amortize the
axon dispatch floor (probe_cnn_bwd.py methodology).

    python scripts/probe_dilation_layers.py [N] [CHAIN] [EDGE_DIV]

EDGE_DIV sets the split threshold edge_min = L // EDGE_DIV (default
4). OUTCOME (r4, two runs at N=5120): d=64 restricted 3.7/3.8 ms vs
full 4.4-4.9 — a real ~20% win, shipped as the production kernel's
waste>30% split (cnn_layer_pallas._kernel); d=16 within noise;
EDGE_DIV=2 (split only +-128/192) halves the win. The noshift column
shows the shifted accumulate is NOT the d=64 cost (a), the wasted
dot rows are (b).
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

from svdd_tpu.ops.cnn_layer_pallas import (_live_offsets, _live_taps,
                                           _pick_tile_n,
                                           cnn_layer_pallas,
                                           cnn_layer_reference)


def _ln(x_ref, br_ref, g_ref, b_ref, eps):
  x = x_ref[:]
  tn, l, c = x.shape
  h = x.astype(jnp.float32) + br_ref[:].astype(jnp.float32)[:, None, :]
  mu = jnp.mean(h, axis=-1, keepdims=True)
  var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
  h = (h - mu) * jax.lax.rsqrt(var + eps)
  h = h * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
  return x, h.astype(x.dtype)


def _kernel_noshift(x_ref, br_ref, g_ref, b_ref, w_ref, cb_ref, o_ref,
                    *, offsets, eps, out_dtype):
  x, h = _ln(x_ref, br_ref, g_ref, b_ref, eps)
  tn, l, c = x.shape
  y = jax.lax.dot_general(h.reshape(tn * l, c), w_ref[:],
                          (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
  y = y.astype(x.dtype).reshape(tn, l, len(offsets) * c)
  acc = jnp.zeros((tn, l, c), jnp.float32)
  for j, _ in enumerate(offsets):
    acc = acc + y[:, :, j * c:(j + 1) * c].astype(jnp.float32)
  acc = acc + cb_ref[0].astype(jnp.float32)[None, None, :]
  o_ref[:] = jnp.maximum(acc, 0.0).astype(out_dtype) + x.astype(out_dtype)


def _kernel_restricted(x_ref, br_ref, g_ref, b_ref, w_ref, cb_ref,
                       o_ref, *, offsets, eps, out_dtype, edge_min):
  """Exact-math: big offsets run as per-tap dots on contributing rows
  only. out[i] += tapout[i + off] means rows [max(0,-off), l-|off|+
  max(0,-off)) of the OUTPUT take tap rows [max(0,off), ...)."""
  x, h = _ln(x_ref, br_ref, g_ref, b_ref, eps)
  tn, l, c = x.shape
  inner = [j for j, o in enumerate(offsets) if abs(o) < edge_min]
  acc = jnp.zeros((tn, l, c), jnp.float32)
  y = None
  if inner:
    w_in = jnp.concatenate([w_ref[:, j * c:(j + 1) * c] for j in inner],
                           axis=1)
    y = jax.lax.dot_general(h.reshape(tn * l, c), w_in,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y.astype(x.dtype).reshape(tn, l, len(inner) * c)
  # accumulate in the ORIGINAL tap order (the production kernel's)
  # so the f32 reassociation is identical -> bit-exact output
  for j, off in enumerate(offsets):
    if j in inner:
      jj = inner.index(j)
      slab = y[:, :, jj * c:(jj + 1) * c]
      if off >= 0:
        seg, pad = slab[:, off:, :], ((0, 0), (0, off), (0, 0))
      else:
        seg, pad = slab[:, :l + off, :], ((0, 0), (-off, 0), (0, 0))
      acc = acc + (jnp.pad(seg, pad) if off else slab).astype(jnp.float32)
    else:
      rows = l - abs(off)
      src = h[:, off:, :] if off >= 0 else h[:, :l + off, :]
      yj = jax.lax.dot_general(src.reshape(tn * rows, c),
                               w_ref[:, j * c:(j + 1) * c],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
      yj = yj.astype(x.dtype).reshape(tn, rows, c).astype(jnp.float32)
      pad = ((0, 0), (0, l - rows), (0, 0)) if off >= 0 \
          else ((0, 0), (l - rows, 0), (0, 0))
      acc = acc + jnp.pad(yj, pad)
  acc = acc + cb_ref[0].astype(jnp.float32)[None, None, :]
  o_ref[:] = jnp.maximum(acc, 0.0).astype(out_dtype) + x.astype(out_dtype)


def call_variant(body_fn, x, br, g, b, w, cb, offsets, k_live,
                 flops_rows):
  n, l, c = x.shape
  tile_n = _pick_tile_n(n, l, c, k_live)
  return pl.pallas_call(
      body_fn,
      grid=(n // tile_n,),
      in_specs=[
          pl.BlockSpec((tile_n, l, c), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_n, c), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((c, k_live * c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((tile_n, l, c), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, l, c), x.dtype),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      cost_estimate=pl.CostEstimate(
          flops=2 * n * flops_rows * c * c,
          bytes_accessed=(x.size * 2 + br.size + w.size) * 2,
          transcendentals=0),
  )(x, br, g.reshape(1, c), b.reshape(1, c), w, cb.reshape(1, c))


def main():
  n = int(sys.argv[1]) if len(sys.argv) > 1 else 5120
  chain = int(sys.argv[2]) if len(sys.argv) > 2 else 16
  edge_div = int(sys.argv[3]) if len(sys.argv) > 3 else 4
  l, c, k = 200, 128, 9
  print(f'config: N={n} L={l} C={c} k={k} bf16 chain={chain}',
        flush=True)

  key = jax.random.key(0)
  ks = jax.random.split(key, 8)
  x0 = jax.random.normal(ks[0], (n, l, c), jnp.bfloat16)
  br = (0.1 * jax.random.normal(ks[1], (n, c))).astype(jnp.bfloat16)
  g = 1.0 + 0.1 * jax.random.normal(ks[2], (c,), jnp.float32)
  b = 0.1 * jax.random.normal(ks[3], (c,), jnp.float32)
  kern = 0.03 * jax.random.normal(ks[4], (k, c, c), jnp.bfloat16)
  cb = 0.05 * jax.random.normal(ks[5], (c,), jnp.float32)

  for d in (1, 4, 16, 64):
    live = _live_taps(k, d, l)
    offsets = tuple(_live_offsets(k, d, l))
    k_live = len(live)
    w = jnp.concatenate([kern[t] for t in live], axis=1)
    useful = sum(l - abs(o) for o in offsets)
    nominal = k_live * l
    gflop = 2 * n * nominal * c * c / 1e9

    # exactness check of the restricted variant (shippable only if
    # bit-identical): compare one call vs the production kernel
    edge_min = l // edge_div
    ref = cnn_layer_pallas(x0, br, g, b, kern, cb, dilation=d)
    restr = call_variant(
        functools.partial(_kernel_restricted, offsets=offsets,
                          eps=1e-6, out_dtype=x0.dtype,
                          edge_min=edge_min),
        x0, br, g, b, w, cb, offsets, k_live, useful)
    exact = bool(jnp.all(ref == restr))

    variants = {
        'full': lambda xx: cnn_layer_pallas(xx, br, g, b, kern, cb,
                                            dilation=d),
        'noshift': lambda xx: call_variant(
            functools.partial(_kernel_noshift, offsets=offsets,
                              eps=1e-6, out_dtype=x0.dtype),
            xx, br, g, b, w, cb, offsets, k_live, nominal),
        'restricted': lambda xx: call_variant(
            functools.partial(_kernel_restricted, offsets=offsets,
                              eps=1e-6, out_dtype=x0.dtype,
                              edge_min=edge_min),
            xx, br, g, b, w, cb, offsets, k_live, useful),
    }
    row = [f'd={d:3d} k_live={k_live} useful={useful/nominal:.0%} '
           f'exact={exact}']
    for name, fn in variants.items():
      # reduce ON DEVICE and fetch one scalar — fetching the
      # (N, L, C) output through the axon tunnel (262 MB) would
      # dominate the measurement by 100x
      chained = jax.jit(lambda xx: jnp.sum(jax.lax.fori_loop(
          0, chain, lambda i, v: fn(v), xx).astype(jnp.float32)))
      np.asarray(chained(x0))  # compile + warmup
      reps = 3
      times = []
      for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chained(x0))
        times.append(time.perf_counter() - t0)
      dt = min(times) / chain
      row.append(f'{name}={dt*1e3:7.3f}ms ({gflop/dt/1e3:6.1f} TF/s '
                 'nominal)')
    print('  '.join(row), flush=True)


if __name__ == '__main__':
  main()
