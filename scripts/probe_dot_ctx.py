"""Why do the in-graph transformer dots run 167-182 TF/s when their
shapes measure 193-195 standalone (probe_dot_walls.py)?

The r3 MC trace (dump_dot_fusions.py) shows the residual stream held
in the {1,2,0} HLO layout (N minor, C second — transposed vs the dot-
preferred {2,1,0}) with the next layer's LN-stats reduce fused into
each dot's epilogue. Three suspects, measured standalone here at the
exact (2, 5120, C) transformer shapes:

  A. clean rank-3 chain               (baseline, expect ~194)
  B. lhs layout-forced to (0,2,1)     (the in-graph transposed read)
  C. full per-layer pattern: LN-apply prologue + dot + residual add
     + next LN stats epilogue, stream layout left to XLA
  D. pattern C with the stream layout pinned to default (0,1,2) via
     with_layout_constraint — IF the dots recover ~194 and the net
     per-layer time drops, pinning the layout in FastLayerNorm is the
     fix in the real model.

Timing is device-trace based (see probe_dot_walls.py harness notes).
"""
import functools
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import layout as jlayout

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)

L, NM = 2, 5120
CHAIN = 12
TRACE_ROOT = '/tmp/dot_ctx_traces'

SHAPES = [
    ('qk 1536->512', 1536, 512),
    ('v/out 1536->1536', 1536, 1536),
    ('ffn_up 1536->3072', 1536, 3072),
    ('ffn_down 3072->1536', 3072, 1536),
]

TRANSPOSED = jlayout.Layout(major_to_minor=(0, 2, 1))
DEFAULT = jlayout.Layout(major_to_minor=(0, 1, 2))


def trace_device_ms(trace_dir, bucket_flops):
  """(per-dot ms over matching events, n, total device ms)."""
  paths = glob.glob(os.path.join(trace_dir, '**', '*.trace.json.gz'),
                    recursive=True)
  data = json.load(gzip.open(paths[0], 'rt'))
  pid_names = {}
  for ev in data['traceEvents']:
    if ev.get('ph') == 'M' and ev.get('name') == 'process_name':
      pid_names[ev['pid']] = ev['args'].get('name', '')
  device_pids = {p for p, n in pid_names.items() if 'TPU' in n}
  dot_us, n, tot_us = 0.0, 0, 0.0
  for ev in data['traceEvents']:
    if ev.get('ph') != 'X' or ev.get('pid') not in device_pids:
      continue
    args = ev.get('args', {})
    if args.get('hlo_category') == 'while':
      continue
    tot_us += ev.get('dur', 0)
    flops = int(args.get('model_flops', 0) or 0)
    if flops >= 0.5 * bucket_flops:
      dot_us += ev.get('dur', 0)
      n += 1
  return (dot_us / 1e3 / n if n else None), n, tot_us / 1e3


def run_traced(fn, args, tag, flops):
  fn_j = jax.jit(fn)
  np.asarray(fn_j(*args))
  tdir = os.path.join(TRACE_ROOT, tag)
  jax.profiler.start_trace(tdir)
  np.asarray(fn_j(*args))
  jax.profiler.stop_trace()
  ms, n, tot = trace_device_ms(tdir, flops)
  return ms, n, tot


def chain_clean(x, w, scales, lhs_layout=None):
  acc = jnp.float32(0.0)
  for i in range(CHAIN):
    xi = x * scales[i]
    if lhs_layout is not None:
      xi = jlayout.with_layout_constraint(xi, lhs_layout)
    y = jnp.einsum('lnc,cd->lnd', xi, w)
    acc = acc + jnp.sum(y.astype(jnp.float32))
  return acc


def chain_layer(s, w, g, b, pin=None):
  # per-layer pattern: LN stats -> bf16 LN-apply -> dot -> residual
  for _ in range(CHAIN):
    if pin is not None:
      s = jlayout.with_layout_constraint(s, pin)
    mean = jnp.mean(s.astype(jnp.float32), axis=-1, keepdims=True)
    var = jnp.var(s.astype(jnp.float32), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xln = ((s - mean.astype(s.dtype)) * rstd.astype(s.dtype)
           * g + b)
    y = jnp.einsum('lnc,cd->lnd', xln, w)
    s = s + y
  return jnp.sum(s.astype(jnp.float32))


def main():
  shutil.rmtree(TRACE_ROOT, ignore_errors=True)
  key = jax.random.key(0)
  print(f'{"case":42s} {"ms/dot":>7} {"TF/s":>6} {"n":>3} '
        f'{"tot_ms":>7}', flush=True)
  for i, (label, c_in, c_out) in enumerate(SHAPES):
    x = jax.random.normal(key, (L, NM, c_in), jnp.bfloat16) * 0.05
    w = jax.random.normal(jax.random.fold_in(key, 1), (c_in, c_out),
                          jnp.bfloat16) * 0.05
    scales = (1.0 + jnp.arange(CHAIN, dtype=jnp.bfloat16)
              / (2.0 * CHAIN))
    flops = 2.0 * L * NM * c_in * c_out
    for tag, fn, args in [
        ('A clean', chain_clean, (x, w, scales)),
        ('B lhs transposed', functools.partial(
            chain_clean, lhs_layout=TRANSPOSED), (x, w, scales)),
    ]:
      ms, n, tot = run_traced(fn, args, f's{i}{tag[:1]}', flops)
      tf = flops / ms / 1e9 if ms else 0
      print(f'{label + " " + tag:42s} {ms or 0:7.3f} {tf:6.1f} '
            f'{n:3d} {tot:7.2f}', flush=True)
    if c_in != c_out:
      continue
    g = jnp.ones((c_in,), jnp.bfloat16)
    b = jnp.zeros((c_in,), jnp.bfloat16)
    for tag, pin in [('C layer pattern (XLA layout)', None),
                     ('D layer pattern (pin default)', DEFAULT)]:
      ms, n, tot = run_traced(
          functools.partial(chain_layer, pin=pin), (x, w, g, b),
          f's{i}{tag[:1]}', flops)
      tf = flops / ms / 1e9 if ms else 0
      print(f'{label + " " + tag:42s} {ms or 0:7.3f} {tf:6.1f} '
            f'{n:3d} {tot:7.2f}', flush=True)


if __name__ == '__main__':
  main()
