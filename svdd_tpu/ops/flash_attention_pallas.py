"""Pallas fused attention kernel (TPU).

Replaces flash-attn's CUDA varlen kernel for the DiT/AR backbones
(reference models/dit.py:272-273, models/autoregressive.py:224-226).

Design point: the workloads here are short-sequence (L=200 bio, L=1024
legacy text) with head_dim 64 — K and V for one (batch, head) fit in
VMEM outright (1024 x 64 x 4B = 256 KB), so instead of an online-
softmax streaming kernel we tile over (batch*heads, q-blocks) and keep
the whole K/V resident: one VMEM pass, softmax fused between the two
MXU matmuls, no HBM round-trip for the (L x L) score matrix — which is
exactly what flash attention buys at these sizes.

Falls back to XLA attention (ops.attention.mha) for shapes that don't
tile (callers route through ops.attention.flash_mha).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                 causal: bool, blk_q: int):
  q = q_ref[0]                                   # (blk_q, D)
  k = k_ref[0]                                   # (L, D)
  v = v_ref[0]                                   # (L, D)
  scores = jax.lax.dot_general(
      q, k, (((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32) * scale  # (blk_q, L)
  if causal:
    qi = pl.program_id(1)
    row = (jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
           + qi * blk_q)
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(col <= row, scores, -jnp.inf)
  m = jnp.max(scores, axis=-1, keepdims=True)
  p = jnp.exp(scores - m)
  denom = jnp.sum(p, axis=-1, keepdims=True)
  o = jax.lax.dot_general(
      p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  o_ref[0] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('causal', 'blk_q'))
def flash_attention(q: Array, k: Array, v: Array, *,
                    causal: bool = False, blk_q: int = 128) -> Array:
  """(B, L, H, D) attention. Requires L % blk_q == 0."""
  b, l, h, d = q.shape
  scale = 1.0 / math.sqrt(d)
  # (BH, L, D) layout: one grid row per (batch, head)
  qf = q.transpose(0, 2, 1, 3).reshape(b * h, l, d)
  kf = k.transpose(0, 2, 1, 3).reshape(b * h, l, d)
  vf = v.transpose(0, 2, 1, 3).reshape(b * h, l, d)

  grid = (b * h, l // blk_q)
  out = pl.pallas_call(
      functools.partial(_attn_kernel, scale=scale, causal=causal,
                        blk_q=blk_q),
      grid=grid,
      in_specs=[
          pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, blk_q, d), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b * h, l, d), q.dtype),
      cost_estimate=pl.CostEstimate(
          flops=4 * b * h * l * l * d,
          bytes_accessed=(3 * b * h * l * d + b * h * l * d) * 2,
          transcendentals=b * h * l * l,
      ),
  )(qf, kf, vf)
  return out.reshape(b, h, l, d).transpose(0, 2, 1, 3)
