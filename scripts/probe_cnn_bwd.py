"""Probe the fused Pallas CNN-layer backward on TPU.

Per dilation at the diffusion-train microbatch shape (128, 200, 128,
k=9, bf16): (1) check the Mosaic lowering compiles, (2) check
numerics vs the XLA reference VJP, (3) time it against the reference
VJP (the current _fused_bwd fallback, whose im2col forward-recompute +
differentiated pad/slice chains measured 85 TF/s in the train
backward bucket — TODO.md train roofline).

    python scripts/probe_cnn_bwd.py [N] [L] [C]
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


def main():
  n = int(sys.argv[1]) if len(sys.argv) > 1 else 128
  l = int(sys.argv[2]) if len(sys.argv) > 2 else 200
  c = int(sys.argv[3]) if len(sys.argv) > 3 else 128
  k = 9
  steps = 20
  print(f'config: N={n} L={l} C={c} k={k} bf16', flush=True)

  from svdd_tpu.ops.cnn_layer_pallas import (cnn_layer_bwd_pallas,
                                             cnn_layer_reference,
                                             _live_taps)

  key = jax.random.key(0)
  ks = jax.random.split(key, 8)
  x = jax.random.normal(ks[0], (n, l, c), jnp.bfloat16)
  br = 0.5 * jax.random.normal(ks[1], (n, c), jnp.bfloat16)
  g = 1.0 + 0.1 * jax.random.normal(ks[2], (c,), jnp.float32)
  b = 0.1 * jax.random.normal(ks[3], (c,), jnp.float32)
  w = 0.05 * jax.random.normal(ks[4], (k, c, c), jnp.bfloat16)
  cb = 0.1 * jax.random.normal(ks[5], (c,), jnp.float32)
  ct = jax.random.normal(ks[6], (n, l, c), jnp.bfloat16)

  @functools.partial(jax.jit, static_argnames=('dil',))
  def ref_vjp(x, br, g, b, w, cb, ct, dil):
    _, vjp = jax.vjp(
        lambda *a: cnn_layer_reference(*a, dilation=dil),
        x, br, g, b, w, cb)
    return vjp(ct)

  # The axon tunnel's per-program dispatch floor (~9.5 ms measured)
  # swamps a single 23-GFLOP call — time a CHAIN of dependent calls
  # inside ONE jitted scan (ct_{i+1} = dx_i defeats CSE), like the
  # probe_dot_walls methodology.
  chain = 32

  @functools.partial(jax.jit, static_argnames=('dil', 'use_pallas'))
  def bwd_chain(x, br, g, b, w, cb, ct, dil, use_pallas):
    def step(ct, _):
      if use_pallas:
        outs = cnn_layer_bwd_pallas(x, br, g, b, w, cb, ct,
                                    dilation=dil)
      else:
        outs = ref_vjp(x, br, g, b, w, cb, ct, dil)
      return outs[0], None                        # dx feeds next ct
    out, _ = jax.lax.scan(step, ct, None, length=chain)
    # scalar output: fetching the full (N, L, C) through the axon
    # tunnel costs more than the kernels being timed
    return jnp.sum(out.astype(jnp.float32))

  for dil in (1, 4, 16, 64):
    live = len(_live_taps(k, dil, l))
    flops = 3 * 2 * n * l * live * c * c       # recompute+dgrad+wgrad
    # --- numerics sanity (one call each) ---
    try:
      got = cnn_layer_bwd_pallas(x, br, g, b, w, cb, ct, dilation=dil)
      got = [np.asarray(a, np.float32) for a in got]
    except Exception as e:  # noqa: BLE001 - probe reports and moves on
      print(f'dil={dil}: PALLAS BWD FAILED: {type(e).__name__}: '
            f'{str(e)[:300]}', flush=True)
      continue
    want = ref_vjp(x, br, g, b, w, cb, ct, dil)
    want = [np.asarray(a, np.float32) for a in want]
    errs = []
    for gt, wt in zip(got, want):
      denom = np.maximum(np.abs(wt).max(), 1e-6)
      errs.append(float(np.abs(gt - wt).max() / denom))
    # --- timing: chained scan, wall/chain ---
    times = {}
    for use_pallas in (True, False):
      out = bwd_chain(x, br, g, b, w, cb, ct, dil, use_pallas)
      np.asarray(out)                            # compile + settle
      t0 = time.perf_counter()
      for _ in range(steps // 4):
        out = bwd_chain(x, br, g, b, w, cb, ct, dil, use_pallas)
        np.asarray(out)
      times[use_pallas] = ((time.perf_counter() - t0)
                           / (steps // 4) / chain)
    dt_p, dt_r = times[True], times[False]
    print(f'dil={dil} live={live}: pallas {dt_p*1e3:.3f} ms '
          f'({flops/dt_p/1e12:.1f} TF/s) vs ref-vjp {dt_r*1e3:.3f} ms '
          f'({flops/dt_r/1e12:.1f} TF/s)  max rel err '
          f'{[f"{e:.2e}" for e in errs]}', flush=True)


if __name__ == '__main__':
  main()
