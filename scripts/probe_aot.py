"""AOT artifact validation on real hardware.

``export`` mode: build the bench-shaped SVDD-MC sampler, export both
artifact kinds (StableHLO + compiled executable), print sizes and a
reference sample checksum.

``load`` mode (run in a FRESH process): time load_compiled + first
call — the whole point is skipping the 4-8 min cold jit, so the
number that matters is process start -> first sample.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault('SVDD_CNN_BF16', '1')

import jax
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)

B, M, STEPS, L = 512, 10, 128, 200
DIR = '/tmp/svdd_aot'


def main():
  mode = sys.argv[1] if len(sys.argv) > 1 else 'export'
  os.makedirs(DIR, exist_ok=True)
  t0 = time.perf_counter()

  if mode == 'export':
    from bench import build_workload
    from svdd_tpu import aot
    sampler = build_workload(B, M, STEPS, L, small=False)
    print(f'[{time.perf_counter()-t0:7.1f}s] workload built', flush=True)
    n = aot.export_compiled(sampler, f'{DIR}/mc.svddc')
    print(f'[{time.perf_counter()-t0:7.1f}s] compiled artifact: '
          f'{n/1e6:.1f} MB', flush=True)
    n = aot.export_sampler(sampler, f'{DIR}/mc.svddx')
    print(f'[{time.perf_counter()-t0:7.1f}s] stablehlo artifact: '
          f'{n/1e6:.1f} MB', flush=True)
    import pickle
    den_vars, extra_vars = sampler.default_args
    with open(f'{DIR}/args.pkl', 'wb') as f:
      pickle.dump(jax.device_get((den_vars, extra_vars)), f)
    res = sampler(jax.random.key(42))
    x = np.asarray(res.samples)
    print(f'[{time.perf_counter()-t0:7.1f}s] live sample checksum: '
          f'{int(x.sum())} shape {x.shape}', flush=True)
    return

  # fresh-process load path: no svdd_tpu model code, no tracing
  import pickle
  from svdd_tpu import aot
  with open(f'{DIR}/args.pkl', 'rb') as f:
    den_vars, extra_vars = pickle.load(f)
  den_vars, extra_vars = jax.device_put((den_vars, extra_vars))
  print(f'[{time.perf_counter()-t0:7.1f}s] args loaded + on device',
        flush=True)
  call = aot.load_compiled(f'{DIR}/mc.svddc')
  print(f'[{time.perf_counter()-t0:7.1f}s] executable loaded',
        flush=True)
  res = call(den_vars, extra_vars, jax.random.key(42))
  x = np.asarray(res.samples)
  print(f'[{time.perf_counter()-t0:7.1f}s] first sample done: '
        f'checksum {int(x.sum())} shape {x.shape}', flush=True)
  t1 = time.perf_counter()
  res = call(den_vars, extra_vars, jax.random.key(43))
  np.asarray(res.samples)
  print(f'[{time.perf_counter()-t0:7.1f}s] steady-state decode: '
        f'{time.perf_counter()-t1:.2f}s for B={B}', flush=True)


if __name__ == '__main__':
  main()
