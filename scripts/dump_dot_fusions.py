"""Dump the fusion context of sub-ceiling dot ops from a jax trace.

For every device dot/fusion event above a FLOP floor, print its
achieved TF/s and the full HLO long_name (the fused expression),
sorted by total time — the diagnostic for WHY an in-graph dot runs
below the ~194 TF/s its shape measures standalone
(scripts/probe_dot_walls.py).

    python scripts/dump_dot_fusions.py TRACE.json.gz [min_tfs_gap]
"""
import collections
import gzip
import json
import sys

path = sys.argv[1]
ceiling = 194.0
min_ms = 0.05

data = json.load(gzip.open(path, 'rt'))
pid_names = {}
for ev in data['traceEvents']:
  if ev.get('ph') == 'M' and ev.get('name') == 'process_name':
    pid_names[ev['pid']] = ev['args'].get('name', '')
device_pids = {p for p, n in pid_names.items() if 'TPU' in n}

rows = collections.defaultdict(
    lambda: dict(us=0.0, n=0, flops=0, bytes=0, src='', long=''))
for ev in data['traceEvents']:
  if ev.get('ph') != 'X' or ev.get('pid') not in device_pids:
    continue
  args = ev.get('args', {})
  flops = int(args.get('model_flops', 0) or 0)
  if flops < 1e9:          # dots only; skip elementwise/reduce glue
    continue
  r = rows[ev.get('name', '')]
  r['us'] += ev.get('dur', 0)
  r['n'] += 1
  r['flops'] = flops
  r['bytes'] = int(args.get('raw_bytes_accessed', 0) or 0)
  r['src'] = args.get('source', '')
  r['long'] = args.get('long_name', '')

print(f'{"ms(tot)":>8} {"TF/s":>6} {"GB/s":>6}  name | src')
for name, r in sorted(rows.items(), key=lambda kv: -kv[1]['us']):
  ms = r['us'] / 1e3
  if ms < min_ms:
    continue
  sec = r['us'] / 1e6 / r['n']
  tf = r['flops'] / sec / 1e12
  gb = r['bytes'] / sec / 1e9 if r['bytes'] else 0
  flag = '  <-- SUB-CEILING' if tf < 0.88 * ceiling else ''
  print(f'\n{ms:8.2f} {tf:6.1f} {gb:6.0f}  {name} | '
        f'{r["src"].replace("/root/repo/svdd_tpu/", "")}{flag}')
  print(f'    {r["long"][:1600]}')
