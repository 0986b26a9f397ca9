"""Validate flash_attention_pallas on real TPU: numerics vs XLA mha +
timing at the legacy-text scale (L=1024, head_dim=64)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')

from svdd_tpu.ops import attention as A
from svdd_tpu.ops import flash_attention_pallas as F

key = jax.random.key(0)
b, l, h, d = 8, 1024, 12, 64
q, k, v = jax.random.normal(key, (3, b, l, h, d), jnp.bfloat16)

ref = np.asarray(jax.jit(A.mha)(q, k, v))
out = np.asarray(F.flash_attention(q, k, v))
err = np.abs(out.astype(np.float32) - ref.astype(np.float32)).max()
print(f'non-causal max abs err: {err:.5f}', flush=True)

ref_c = np.asarray(jax.jit(lambda a, b_, c: A.mha(a, b_, c,
                                                  causal=True))(q, k, v))
out_c = np.asarray(F.flash_attention(q, k, v, causal=True))
err_c = np.abs(out_c.astype(np.float32) - ref_c.astype(np.float32)).max()
print(f'causal     max abs err: {err_c:.5f}', flush=True)


def timed(fn, n=10):
  np.asarray(fn())
  t = time.perf_counter()
  for _ in range(n):
    r = fn()
  np.asarray(r)
  return (time.perf_counter() - t) / n


t_xla = timed(lambda: jax.jit(A.mha)(q, k, v))
t_pal = timed(lambda: F.flash_attention(q, k, v))
print(f'L=1024 H=12 D=64 B=8:  xla {t_xla*1e3:.2f} ms   '
      f'pallas {t_pal*1e3:.2f} ms', flush=True)
