"""Aggregate device op durations from a jax profiler trace.json.gz."""
import collections
import gzip
import json
import re
import sys

path = sys.argv[1]
group_re = re.compile(sys.argv[2]) if len(sys.argv) > 2 else None

with gzip.open(path, 'rt') as f:
  data = json.load(f)

# device-side events live on TensorCore pids; find pid names
pid_names = {}
for ev in data['traceEvents']:
  if ev.get('ph') == 'M' and ev.get('name') == 'process_name':
    pid_names[ev['pid']] = ev['args'].get('name', '')

device_pids = {p for p, n in pid_names.items()
               if 'TPU' in n or 'Core' in n or 'device' in n.lower()}

tot = collections.Counter()
cnt = collections.Counter()
wall = 0.0
for ev in data['traceEvents']:
  if ev.get('ph') != 'X' or ev.get('pid') not in device_pids:
    continue
  name = ev.get('name', '')
  dur = ev.get('dur', 0) / 1e3   # us -> ms
  tot[name] += dur
  cnt[name] += 1
  wall += dur

print(f'total device op time: {wall:.1f} ms  '
      f'(pids: {[pid_names[p] for p in device_pids]})')
print(f'{"ms":>9} {"n":>5}  name')
for name, ms in tot.most_common(40):
  print(f'{ms:9.2f} {cnt[name]:5d}  {name[:110]}')
