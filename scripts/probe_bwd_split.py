"""Probe: restricted-row tap split for the fused CNN-layer BACKWARD
(VERDICT r4 item 5 — the fwd split's twin).

At d=64/L=200 the r4 fwd probe showed the wide tap-stacked dot discards
55% of its row FLOPs; the fused backward runs THREE such dot groups
(fwd recompute, dgrad mirror, wgrad contraction) on the same offsets.
This probe A/Bs the shipped split rule against the r4 all-wide kernel
per dilation at the train microbatch shape (default 256, 200, 128,
bf16):
  * exactness: split vs all-wide outputs compared elementwise
    (expected bit-exact: identical multiplies, same f32 accumulation;
    dropped rows are exact zeros / discarded outputs),
  * timing: chained dependent calls inside one scan (probe_cnn_bwd
    methodology; scalar fetch).

    python scripts/probe_bwd_split.py [N] [L] [C]

Mode switch is SVDD_SPLIT_TAPS (read at trace time) + jax.clear_caches()
between modes — one process, sequential.
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
  n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
  l = int(sys.argv[2]) if len(sys.argv) > 2 else 200
  c = int(sys.argv[3]) if len(sys.argv) > 3 else 128
  k = 9
  chain = 32
  trials = 5
  print(f'config: N={n} L={l} C={c} k={k} bf16 chain={chain}',
        flush=True)

  from svdd_tpu.ops import cnn_layer_pallas as clp

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
  def bwd_chain(x, br, g, b, w, cb, ct, dil):
    def step(ct, _):
      outs = clp.cnn_layer_bwd_pallas(x, br, g, b, w, cb, ct,
                                      dilation=dil)
      return outs[0], None
    out, _ = jax.lax.scan(step, ct, None, length=chain)
    return jnp.sum(out.astype(jnp.float32))

  for dil in (16, 64):
    offsets = clp._live_offsets(k, dil, l)
    live = len(offsets)
    waste = sum(abs(o) for o in offsets) / max(live * l, 1)
    flops = 3 * 2 * n * l * live * c * c
    results = {}
    # '0' = r4 all-wide; 'rule' = shipped (split recompute+dgrad,
    # wgrad wide); 'wgrad' = measured-negative full split
    for mode in ('0', 'rule', 'wgrad'):
      os.environ.pop('SVDD_SPLIT_TAPS', None)
      os.environ.pop('SVDD_SPLIT_WGRAD', None)
      if mode == '0':
        os.environ['SVDD_SPLIT_TAPS'] = '0'
      elif mode == 'wgrad':
        os.environ['SVDD_SPLIT_WGRAD'] = '1'
      jax.clear_caches()
      outs = clp.cnn_layer_bwd_pallas(x, br, g, b, w, cb, ct,
                                      dilation=dil)
      results[mode] = [np.asarray(a, np.float32) for a in outs]
      sc = bwd_chain(x, br, g, b, w, cb, ct, dil)
      np.asarray(sc)                        # compile + settle
      ts = []
      for _ in range(trials):
        t0 = time.perf_counter()
        sc = bwd_chain(x, br, g, b, w, cb, ct, dil)
        np.asarray(sc)
        ts.append((time.perf_counter() - t0) / chain)
      dt = min(ts)
      label = {'0': 'all-wide    ', 'rule': 'shipped-rule',
               'wgrad': 'full-split  '}[mode]
      print(f'dil={dil} live={live} waste={waste:.2f} {label}: '
            f'{dt*1e3:.3f} ms ({flops/dt/1e12:.1f} TF/s)  '
            f'[{", ".join(f"{t*1e3:.2f}" for t in ts)}]', flush=True)
    for mode in ('rule', 'wgrad'):
      exact = all((a == b).all() for a, b in
                  zip(results['0'], results[mode]))
      if not exact:
        rels = [float(np.abs(a - b).max()
                      / max(np.abs(a).max(), 1e-9))
                for a, b in zip(results['0'], results[mode])]
        print(f'dil={dil} {mode}: NOT bit-exact, max REL diffs '
              f'{[f"{e:.1e}" for e in rels]}', flush=True)
      else:
        print(f'dil={dil} {mode}: output BIT-EXACT vs all-wide',
              flush=True)
  os.environ.pop('SVDD_SPLIT_TAPS', None)
  os.environ.pop('SVDD_SPLIT_WGRAD', None)


if __name__ == '__main__':
  main()
