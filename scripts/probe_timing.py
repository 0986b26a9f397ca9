"""Check whether block_until_ready actually blocks on the axon backend."""
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

from svdd_tpu.models.enformer import EnformerValueModel

vm = EnformerValueModel(n_tasks=1, compute_dtype=jnp.bfloat16)
vv = jax.jit(vm.init)(jax.random.key(1), jnp.zeros((1, 200, 4)))
vapply = jax.jit(vm.apply)
big = jnp.ones((2560, 200, 4), jnp.bfloat16)
out = vapply(vv, big)
out.block_until_ready()
print('compiled', flush=True)

for tag, force in [('block_until_ready', lambda r: r.block_until_ready()),
                   ('np.asarray', lambda r: np.asarray(r))]:
  t = time.perf_counter()
  for i in range(5):
    r = vapply(vv, big)
    force(r)
  dt = (time.perf_counter() - t) / 5
  print(f'{tag}: {dt*1e3:.1f} ms/call', flush=True)

# sanity: result values are real
r = np.asarray(vapply(vv, big))
print('out[:3] =', r[:3], 'finite:', np.isfinite(r).all())
