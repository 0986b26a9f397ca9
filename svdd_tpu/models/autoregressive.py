"""AR (causal transformer) baseline backbone + decode loop.

Flax rebuild of the reference AR model (/root/reference/models/
autoregressive.py:273-358 — a causal DDiT without time conditioning)
and its sampling loop (_ar_sampler, diffusion_gosai.py:802-818).

TPU-native: the decode loop is a lax.scan over positions with
pre-drawn Gumbel noise (exactly the reference's trick of presampling
the noise tensor :810-813); attention is causal XLA attention
(ops.attention) instead of flash-attn varlen.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from svdd_tpu.config import Config
from svdd_tpu.models.dit import rotary_cos_sin, apply_rotary
from svdd_tpu.ops import attention as attn_ops

Array = jnp.ndarray


class ARBlock(nn.Module):
  """Causal transformer block (autoregressive.py DDIT blocks)."""
  dim: int
  n_heads: int
  mlp_ratio: int = 4
  dropout: float = 0.1

  @nn.compact
  def __call__(self, x: Array, cos: Array, sin: Array,
               train: bool = False) -> Array:
    b, l, _ = x.shape
    h = self.n_heads
    hd = self.dim // h
    skip = x
    xm = nn.LayerNorm(use_bias=False, dtype=x.dtype)(x)
    qkv = nn.Dense(3 * self.dim, use_bias=False, name='attn_qkv')(xm)
    q, k, v = jnp.split(qkv.reshape(b, l, 3, h, hd), 3, axis=2)
    q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
    q = apply_rotary(q, cos, sin)
    k = apply_rotary(k, cos, sin)
    o = attn_ops.flash_mha(q, k, v, causal=True)
    o = nn.Dense(self.dim, use_bias=False, name='attn_out')(
        o.reshape(b, l, self.dim))
    x = skip + nn.Dropout(self.dropout, deterministic=not train)(o)
    xm = nn.LayerNorm(use_bias=False, dtype=x.dtype)(x)
    y = nn.Dense(self.mlp_ratio * self.dim, name='mlp_0')(xm)
    y = jax.nn.gelu(y, approximate=True)
    y = nn.Dense(self.dim, name='mlp_1')(y)
    return x + nn.Dropout(self.dropout, deterministic=not train)(y)


class ARModel(nn.Module):
  """Causal LM over the DNA vocab. sigma is accepted and ignored
  (parameterization 'ar' passes None/zeros)."""
  config: Config
  vocab_size: int
  compute_dtype: jnp.dtype = jnp.bfloat16

  @nn.compact
  def __call__(self, indices: Array, sigma: Array = None, *,
               x_onehot: Array | None = None,
               train: bool = False) -> Array:
    mcfg = self.config.model
    dim = mcfg.hidden_size
    embed = self.param('vocab_embed', nn.initializers.normal(0.02),
                       (self.vocab_size, dim))
    x = (embed[indices] if x_onehot is None
         else x_onehot @ embed).astype(self.compute_dtype)
    cos, sin = rotary_cos_sin(x.shape[1], dim // mcfg.n_heads)
    cos = cos.astype(self.compute_dtype)
    sin = sin.astype(self.compute_dtype)
    for i in range(mcfg.n_blocks):
      x = ARBlock(dim, mcfg.n_heads, dropout=mcfg.dropout,
                  name=f'block_{i}')(x, cos, sin, train=train)
    x = nn.LayerNorm(use_bias=False, dtype=x.dtype)(x)
    logits = nn.Dense(self.vocab_size, name='lm_head')(x)
    # log-probs (the AR loss gathers log p directly,
    # diffusion_gosai.py:1765-1768)
    return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)


def ar_sample(model: ARModel, variables, batch_size: int, length: int,
              key: jax.Array, bos_token: int = 0) -> Array:
  """AR ancestral decode (_ar_sampler, diffusion_gosai.py:802-818):
  pre-draw Gumbel noise, then scan over positions. Each step re-runs
  the full prefix forward (as the reference does — no KV cache in
  either implementation; L<=200 keeps this cheap)."""
  num_pred = length - 1
  noise = jax.random.gumbel(
      key, (batch_size, num_pred, model.vocab_size))
  x0 = jnp.zeros((batch_size, length), jnp.int32).at[:, 0].set(bos_token)

  def body(x, i):
    logits = model.apply(variables, x, jnp.zeros((batch_size,)))
    next_logits = jnp.take_along_axis(
        logits, i[None, None, None].repeat(batch_size, 0), axis=1
    )[:, 0]
    y = jnp.argmax(next_logits + noise[:, i], axis=-1)
    x = jax.lax.dynamic_update_index_in_dim(
        x.T, y, i + 1, axis=0).T
    return x, None

  x, _ = jax.lax.scan(body, x0, jnp.arange(num_pred))
  return x
