"""Fused Gumbel candidate-draw kernel for the SVDD guided step.

The per-step hot path draws M candidate next-states per row:
``argmax(log_q[:, None] + gumbel((B, M, L, V)))`` plus a copy-flag
merge (sampling/guidance.py _draw_candidates). XLA materializes the
(B, M, L, V) Gumbel tensor in HBM (B=256, M=10, L=200, V=5 -> 10 MB per
step, 1.3 GB per decode). This Pallas kernel generates the noise
in-register with the per-core PRNG (pltpu.prng_random_bits), so HBM
traffic is just log_q in + candidates out — the fused
"gumbel-sample + select" kernel named as the Pallas target in
BASELINE.json.

Used when shapes tile and we're on TPU; the XLA path remains the
fallback (and the numerics oracle in tests — both are exact Gumbel-max
samplers, equal in distribution though not bitwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


_BLOCK_ROWS = 8   # TPU sublane granularity


def _kernel(seed_ref, logq_ref, x_ref, out_ref, *, repeats: int,
            mask_index: int):
  b_idx = pl.program_id(0)
  pltpu.prng_seed(seed_ref[0] + b_idx)
  log_q = logq_ref[:]                          # (R, L, V) f32
  x = x_ref[:]                                 # (R, L) i32
  copy = x != mask_index
  for m in range(repeats):
    # bitcast to uint32 BEFORE shifting: prng_random_bits yields signed
    # ints and an arithmetic >> smears the sign bit into the exponent
    bits = pltpu.bitcast(pltpu.prng_random_bits(log_q.shape),
                         jnp.uint32)
    # uint32 -> (0, 1): set mantissa bits under exponent 0 -> [1, 2)
    u = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000),
                      jnp.float32) - 1.0
    gumbel = -jnp.log(-jnp.log(u + 1e-20) + 1e-20)
    draw = jnp.argmax(log_q + gumbel, axis=-1).astype(jnp.int32)
    out_ref[:, m] = jnp.where(copy, x, draw)


@functools.partial(jax.jit, static_argnames=('repeats', 'mask_index'))
def gumbel_candidates_pallas(seed: Array, log_q: Array, x: Array,
                             repeats: int, mask_index: int) -> Array:
  """log_q (B, L, V) f32, x (B, L) i32, seed scalar i32
  -> candidates (B, M, L) i32. Requires B % 8 == 0 (sublane tiling)."""
  b, l, v = log_q.shape
  if b % _BLOCK_ROWS:
    raise ValueError(f'batch {b} must be a multiple of {_BLOCK_ROWS}')
  r = _BLOCK_ROWS
  seed_arr = jnp.asarray([seed], jnp.int32)
  return pl.pallas_call(
      functools.partial(_kernel, repeats=repeats,
                        mask_index=mask_index),
      grid=(b // r,),
      in_specs=[
          pl.BlockSpec(memory_space=pltpu.SMEM),
          pl.BlockSpec((r, l, v), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((r, l), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((r, repeats, l), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, repeats, l), jnp.int32),
  )(seed_arr, log_q.astype(jnp.float32), x.astype(jnp.int32))


def gumbel_candidates(key: jax.Array, log_q: Array, x: Array,
                      repeats: int, mask_index: int,
                      use_pallas: bool = False) -> Array:
  """Dispatcher: Pallas on TPU when requested, XLA elsewhere."""
  if use_pallas:
    try:
      seed = jax.random.randint(key, (), 0, 2 ** 31 - 1)
      return gumbel_candidates_pallas(seed, log_q, x, repeats,
                                      mask_index)
    except Exception:
      pass
  gumbel = jax.random.gumbel(
      key, (log_q.shape[0], repeats) + log_q.shape[1:],
      dtype=jnp.float32)
  draws = jnp.argmax(log_q[:, None] + gumbel, axis=-1)
  return jnp.where((x != mask_index)[:, None], x[:, None], draws)
