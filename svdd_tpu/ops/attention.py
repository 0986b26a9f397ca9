"""Multi-head attention for the DiT/AR backbones.

Replaces flash-attn's CUDA varlen kernel (reference models/dit.py:4-5,
272-273). Two paths:

  * ``mha`` — XLA dot-product attention. At the reference workloads
    (L=200 DNA / L=50 RNA) the whole score matrix fits in VMEM and XLA
    fuses softmax into the matmuls; this is already MXU-bound.
  * ``flash_mha`` — Pallas fused attention for long sequences (the
    legacy text MDLM path runs L=1024; measured on v5e: 1.7x the XLA
    path at L=1024 H=12 D=64, max abs err within bf16 tolerance).
    Falls back to ``mha`` off-TPU or when shapes don't tile — the bio
    tasks (L=200/50) take the XLA path, which is already MXU-bound
    there. DiT/AR route through this dispatcher.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def mha(q: Array, k: Array, v: Array, causal: bool = False) -> Array:
  """(B, L, H, D) attention via XLA einsums; fp32 softmax accumulators."""
  d = q.shape[-1]
  logits = jnp.einsum('blhd,bmhd->bhlm', q, k,
                      preferred_element_type=jnp.float32)
  logits = logits / math.sqrt(d)
  if causal:
    l, m = logits.shape[-2:]
    mask = jnp.tril(jnp.ones((l, m), dtype=bool))
    logits = jnp.where(mask, logits, -jnp.inf)
  probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
  return jnp.einsum('bhlm,bmhd->blhd', probs, v)


def _is_tpu() -> bool:
  try:
    return jax.devices()[0].platform in ('tpu', 'axon')
  except Exception:
    return False


def sp_mha(q: Array, k: Array, v: Array, mesh, axis: str = 'model',
           causal: bool = False) -> Array:
  """Sequence-parallel attention: (B, L, H, D) with L sharded over a
  mesh axis. Each device holds an L/N chunk of q/k/v; K and V are
  all-gathered over ICI and each device attends its local queries to
  the full keys/values, so activations (not just weights) scale past
  one chip's HBM. Causal masking uses global positions recovered from
  the device's axis index.

  The reference has no sequence/context parallelism of any kind
  (SURVEY.md §2.2); this serves the long-context text-MDLM configs.
  """
  from jax.sharding import PartitionSpec as P
  from jax.experimental.shard_map import shard_map

  n_shards = mesh.shape[axis]
  l_local = q.shape[1] // n_shards

  def local(q_c, k_c, v_c):
    idx = jax.lax.axis_index(axis)
    k_full = jax.lax.all_gather(k_c, axis, axis=1, tiled=True)
    v_full = jax.lax.all_gather(v_c, axis, axis=1, tiled=True)
    d = q_c.shape[-1]
    logits = jnp.einsum('blhd,bmhd->bhlm', q_c, k_full,
                        preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(d)
    if causal:
      rows = jax.lax.broadcasted_iota(
          jnp.int32, logits.shape[-2:], 0) + idx * l_local
      cols = jax.lax.broadcasted_iota(jnp.int32, logits.shape[-2:], 1)
      logits = jnp.where(rows >= cols, logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1).astype(v_c.dtype)
    return jnp.einsum('bhlm,bmhd->blhd', probs, v_full)

  spec = P(None, axis, None, None)
  return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec)(q, k, v)


@functools.partial(jax.jit, static_argnames=('causal',))
def flash_mha(q: Array, k: Array, v: Array, causal: bool = False) -> Array:
  """Blocked flash attention (Pallas on TPU; XLA fallback elsewhere)."""
  l = q.shape[1]
  d = q.shape[-1]
  if not _is_tpu() or l % 128 != 0 or d % 64 != 0:
    return mha(q, k, v, causal=causal)
  from svdd_tpu.ops import flash_attention_pallas
  return flash_attention_pallas.flash_attention(q, k, v, causal=causal)
