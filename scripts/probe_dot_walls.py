"""Per-bucket wall proof for the sub-ceiling XLA dots (VERDICT r2 #1).

TODO.md's MC trace names two buckets running below the 190+ TF/s
ceiling the k=5 tower dots hit: the 1x1 residual-conv/stem dots
(140-159 TF/s) and the transformer qkv/FFN dots (166-182 TF/s). This
probe times a STANDALONE bf16 dot at each bucket's exact (M, K, N) —
prologue is only the anti-CSE scalar scale fused into the operand
read (measured free, probe_mosaic_convdots.py), epilogue only a
scalar reduce. If the standalone dot runs no faster than the in-graph
op, the bucket is at its own SHAPE wall (MXU efficiency at that
M/K/N) and no fusion surgery can lift it — the same closure argument
probe_mega_bw.py made for the mega-kernel DMA wall.

Harness notes (two invalidated designs, do not regress):
- wall-clock per-call timing floors at the axon tunnel tax
  (~1.4 ms/dot at R=16 — tiny dots read 9-49 TF/s nonsense);
  timing here is DEVICE time from a jax.profiler trace, dot events
  picked by their per-occurrence model_flops signature.
- a lax.scan over R weight copies caps EVERY shape at ~100-102 TF/s
  (incl. the k=5 dots that measure 190-193 in-graph) — loop bodies
  don't pipeline the way straight-line dots do. The harness is the
  UNROLLED scaled-operand chain probe_mosaic_convdots.py validated
  (XLA 147-184 at tower conv shapes).

    python scripts/probe_dot_walls.py            # built-in bucket shapes
    python scripts/probe_dot_walls.py M K N ...  # ad-hoc triples
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

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)

NM = 5120    # B*M at the flagship decode shape (B=512, M=10)
CHAIN = 16   # unrolled anti-CSE dots per traced call

# (label, M, K, N) — tower/transformer dot shapes at B*M=5120.
# Tower lengths after successive pool-by-2 (stem 200->100, then
# 100->52->26->14->8->4 with odd-L pad slabs); channels 768->1536
# exponential (models/enformer.py).
BUCKETS = [
    ('stem k=15 L=200', 200 * NM, 15 * 4, 768),
    ('1x1 stem_block L=200 c=768', 200 * NM, 768, 768),
    ('1x1 pool_1 L=100 c=768', 100 * NM, 768, 768),
    ('1x1 pool_2 L=52 c=896', 52 * NM, 896, 896),
    ('1x1 pool_3 L=26 c=1024', 26 * NM, 1024, 1024),
    ('1x1 pool_4 L=14 c=1152', 14 * NM, 1152, 1152),
    ('1x1 pool_5 L=8 c=1280', 8 * NM, 1280, 1280),
    ('1x1 pool_6 L=4 c=1536', 4 * NM, 1536, 1536),
    ('attn q|k L=2', 2 * NM, 1536, 512),
    ('attn v / to_out L=2', 2 * NM, 1536, 1536),
    ('attn qkv MERGED L=2', 2 * NM, 1536, 2560),
    ('ffn up / pointwise L=2', 2 * NM, 1536, 3072),
    ('ffn down L=2', 2 * NM, 3072, 1536),
    ('k=5 conv_1 L=100 (ceiling ref)', 100 * NM, 5 * 768, 768),
    ('k=5 conv_3 L=26 (ceiling ref)', 26 * NM, 5 * 1024, 1152),
]

TRACE_ROOT = '/tmp/dot_wall_traces'


def chain_sum(x, w, scales):
  acc = jnp.float32(0.0)
  for i in range(CHAIN):
    # distinct operand per step (anti-CSE); the scale fuses into the
    # dot's bf16 operand read
    y = jnp.dot(x * scales[i], w)
    acc = acc + jnp.sum(y.astype(jnp.float32))
  return acc


def device_dot_ms(trace_dir, bucket_flops):
  """Per-occurrence device time of trace events whose model_flops
  matches the bucket's dot (>=50% of one dot's flops)."""
  paths = glob.glob(os.path.join(trace_dir, '**', '*.trace.json.gz'),
                    recursive=True)
  if not paths:
    return None, 0
  data = json.load(gzip.open(paths[0], 'rt'))
  pid_names = {}
  for ev in data['traceEvents']:
    if ev.get('ph') == 'M' and ev.get('name') == 'process_name':
      pid_names[ev['pid']] = ev['args'].get('name', '')
  device_pids = {p for p, n in pid_names.items() if 'TPU' in n}
  tot_us, n, occ_flops = 0.0, 0, 0
  for ev in data['traceEvents']:
    if ev.get('ph') != 'X' or ev.get('pid') not in device_pids:
      continue
    args = ev.get('args', {})
    flops = int(args.get('model_flops', 0) or 0)
    if flops >= 0.5 * bucket_flops:
      tot_us += ev.get('dur', 0)
      n += 1
      occ_flops = max(occ_flops, flops)
  # report per-OCCURRENCE time but flag merged dots (occ_flops >> one
  # dot's flops means the dot-merger pass concatenated chain steps)
  merged = occ_flops > 1.5 * bucket_flops
  return (tot_us / 1e3 / n if n else None), (n if not merged else -n)


def main():
  shapes = BUCKETS
  if len(sys.argv) > 1:
    vals = [int(v) for v in sys.argv[1:]]
    shapes = [(f'adhoc {m}x{k}x{n}', m, k, n)
              for m, k, n in zip(vals[::3], vals[1::3], vals[2::3])]
  shutil.rmtree(TRACE_ROOT, ignore_errors=True)
  key = jax.random.key(0)
  run = jax.jit(chain_sum)
  print(f'{"bucket":34s} {"ms/dot":>8} {"TF/s":>7} {"events":>7}',
        flush=True)
  for i, (label, m, k, n) in enumerate(shapes):
    x = jax.random.normal(key, (m, k), jnp.bfloat16) * 0.05
    w = jax.random.normal(jax.random.fold_in(key, 1), (k, n),
                          jnp.bfloat16) * 0.05
    scales = (1.0 + jnp.arange(CHAIN, dtype=jnp.bfloat16)
              / (2.0 * CHAIN))
    flops = 2.0 * m * k * n

    np.asarray(run(x, w, scales))                   # compile + warm
    tdir = os.path.join(TRACE_ROOT, f'b{i:02d}')
    jax.profiler.start_trace(tdir)
    np.asarray(run(x, w, scales))
    jax.profiler.stop_trace()
    ms, nev = device_dot_ms(tdir, flops)
    note = '  (MERGED dots!)' if nev < 0 else ''
    if ms is None:
      print(f'{label:34s} {"-":>8} {"-":>7} {nev:7d}  (no dot events '
            f'matched)', flush=True)
    else:
      print(f'{label:34s} {ms:8.3f} {flops/ms/1e9:7.1f} {abs(nev):7d}'
            f'{note}', flush=True)


if __name__ == '__main__':
  main()
