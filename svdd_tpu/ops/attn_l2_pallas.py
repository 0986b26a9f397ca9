"""Fused L=2 relative-position attention for the Enformer tower.

After 7 rounds of pooling the value tower's transformer runs at
sequence length TWO (200 / 2^7). At that length XLA's generic MHA
lowering spends ~8 ms/step of the guided decode on head-split layout
copies plus latency-bound softmax/max reduces over (B, 8, 2) shapes
(trace r2-b512: copies at enformer.py:143-169, fusion.743/reduce.207
at 6-7 GB/s).

This kernel computes everything between the q/k/v matmuls and the
to_out matmul in one VMEM pass, WITHOUT ever splitting heads into a
separate axis:

  * per-head logit reductions are segmented LANE sums done as one MXU
    dot against a constant (H*dk, H) head-selector matrix;
  * the 2-way softmax is a sigmoid blend (same trick as
    ops/attn_pool_pallas.py);
  * per-head weights broadcast back to value lanes with a constant
    (H, H*dv) expander dot.

The relative-position bias for L=2 collapses to three rel_k rows
(distances -1/0/+1); the caller pre-gathers them into per-(i,j) rows
so the kernel sees plain elementwise multiplies. Matches the
relative_shift alignment of models/enformer.py:114-122 exactly
(logits[i,j] uses distance j-i).

Reference semantics: enformer_pytorch Attention as rebuilt at
models/enformer.py:125-170 (itself from /root/reference/
Enformer.py:1887-1949).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def head_selector(heads: int, dk: int) -> np.ndarray:
  """(H*dk, H) 0/1 matrix: column h sums head h's lanes."""
  s = np.zeros((heads * dk, heads), np.float32)
  for h in range(heads):
    s[h * dk:(h + 1) * dk, h] = 1.0
  return s


def head_expander(heads: int, dv: int) -> np.ndarray:
  """(H, H*dv) 0/1 matrix: row h broadcasts into head h's lanes."""
  return head_selector(heads, dv).T.copy()


def _prep_relk(relk: Array) -> tuple[Array, Array]:
  """relk (3, H*dk) rows are distances [-1, 0, +1]. Returns per-j
  (2, H*dk) stacks indexed by i: row i uses distance j - i."""
  relk_j0 = jnp.stack([relk[1], relk[0]])    # j=0: i=0 -> d0, i=1 -> d-1
  relk_j1 = jnp.stack([relk[2], relk[1]])    # j=1: i=0 -> d+1, i=1 -> d0
  return relk_j0, relk_j1


def attn_l2_reference(q: Array, k: Array, v: Array, bc: Array,
                      bp: Array, relk: Array, sel: Array, exp: Array):
  """jnp reference; q,k (N, 2, H*dk) with q pre-scaled, v (N, 2, H*dv).
  Returns (out (N, 2, H*dv), w (N, 2, H)) where w = attn[..., j=0]."""
  relk_j0, relk_j1 = _prep_relk(relk)
  qc = (q + bc).astype(jnp.float32)
  qp = (q + bp).astype(jnp.float32)
  k32 = k.astype(jnp.float32)
  logits = []
  for j, rk in ((0, relk_j0), (1, relk_j1)):
    l = (qc * k32[:, j:j + 1, :]
         + qp * rk[None].astype(jnp.float32))
    logits.append(l.reshape(-1, l.shape[-1]) @ sel)   # (N*2, H)
  l0, l1 = logits
  w = jax.nn.sigmoid(l0 - l1)                         # attn at j=0
  wv = (w @ exp).astype(jnp.float32)
  n = q.shape[0]
  v32 = v.astype(jnp.float32)
  v0 = jnp.broadcast_to(v32[:, 0:1, :], v32.shape).reshape(n * 2, -1)
  v1 = jnp.broadcast_to(v32[:, 1:2, :], v32.shape).reshape(n * 2, -1)
  out = wv * v0 + (1.0 - wv) * v1
  return (out.reshape(v.shape).astype(v.dtype),
          w.reshape(n, 2, -1).astype(jnp.float32))


def _kernel(q_ref, k_ref, v_ref, bc_ref, bp_ref, r0_ref, r1_ref,
            s_ref, e_ref, o_ref, w_ref):
  q = q_ref[:]
  tn = q.shape[0]
  qc = (q + bc_ref[0][None, None, :]).astype(jnp.float32)
  qp = (q + bp_ref[0][None, None, :]).astype(jnp.float32)
  k = k_ref[:].astype(jnp.float32)
  sel = s_ref[:]
  dn = (((1,), (0,)), ((), ()))
  # ONE dot for both j logits: the j=0 and j=1 operands differ only
  # elementwise, so subtract first and reduce the difference
  diff = (qc * (k[:, 0:1, :] - k[:, 1:2, :])
          + qp * (r0_ref[:] - r1_ref[:])[None])
  ld = jax.lax.dot_general(diff.reshape(tn * 2, -1), sel, dn,
                           preferred_element_type=jnp.float32)
  w = jax.nn.sigmoid(ld)                               # (tn*2, H)
  wv = jax.lax.dot_general(w, e_ref[:], dn,
                           preferred_element_type=jnp.float32)
  v = v_ref[:].astype(jnp.float32)
  v0 = jnp.broadcast_to(v[:, 0:1, :], v.shape).reshape(tn * 2, -1)
  v1 = jnp.broadcast_to(v[:, 1:2, :], v.shape).reshape(tn * 2, -1)
  out = wv * v0 + (1.0 - wv) * v1
  o_ref[:] = out.reshape(v_ref.shape).astype(v_ref.dtype)
  w_ref[:] = w.reshape(tn, 2, -1)


def _pick_tile_n(n: int, cap: int = 1280) -> int:
  """Largest multiple-of-8 divisor of n up to ``cap`` (f32 blend temps
  cap the block at ~60MB VMEM). Plain halving from the cap collapses
  to tile 2 whenever n lacks a factor of 5 (e.g. N=512: 256 grid
  blocks of 2 rows — bandwidth death); a divisor search doesn't."""
  best = 0
  for cand in range(8, cap + 1, 8):
    if n % cand == 0:
      best = cand
  return best


@functools.partial(jax.jit, static_argnames=('interpret',))
def attn_l2_pallas(q, k, v, bc, bp, relk, sel, exp,
                   interpret: bool = False):
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  n, two, dqk = q.shape
  dv = v.shape[-1]
  heads = sel.shape[-1]
  relk_j0, relk_j1 = _prep_relk(relk)
  tile_n = _pick_tile_n(n)
  grid = (n // tile_n,)
  row = lambda c: pl.BlockSpec((1, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
  return pl.pallas_call(
      _kernel, grid=grid,
      in_specs=[
          pl.BlockSpec((tile_n, 2, dqk), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_n, 2, dqk), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_n, 2, dv), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          row(dqk), row(dqk),
          pl.BlockSpec((2, dqk), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((2, dqk), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((dqk, heads), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((heads, dv), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=[
          pl.BlockSpec((tile_n, 2, dv), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((tile_n, 2, heads), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_shape=[jax.ShapeDtypeStruct((n, 2, dv), v.dtype),
                 jax.ShapeDtypeStruct((n, 2, heads), jnp.float32)],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      interpret=interpret,
  )(q, k, v, bc.reshape(1, dqk), bp.reshape(1, dqk),
    relk_j0, relk_j1, sel, exp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _fused_core(q, k, v, bc, bp, relk, sel, exp, interpret):
  return attn_l2_pallas(q, k, v, bc, bp, relk, sel, exp,
                        interpret=interpret)


def _fused_fwd(q, k, v, bc, bp, relk, sel, exp, interpret):
  out = attn_l2_pallas(q, k, v, bc, bp, relk, sel, exp,
                       interpret=interpret)
  return out, (q, k, v, bc, bp, relk, sel, exp)


def _fused_bwd(interpret, res, ct):
  _, vjp = jax.vjp(attn_l2_reference, *res)
  return vjp(ct)


_fused_core.defvjp(_fused_fwd, _fused_bwd)


def use_pallas_attn_l2() -> bool:
  """Default ON for TPU (opt out with SVDD_PALLAS_ATTN_L2=0)."""
  from svdd_tpu.ops.kernel_utils import default_on_tpu
  return default_on_tpu('SVDD_PALLAS_ATTN_L2')


# ---------------------------------------------------------------------------
# LNC (L-major) variant: q/k/v are (2, N, H*d) — the layout the whole
# L-major trunk runs in (see ops/attn_pool_pallas.py LNC section).
# Positions are leading-dim slabs, so the kernel needs no head
# transposes AND no (N, 2, d) rank-3 boundary relayouts: the qkv dot
# outputs flow in, and the blend output flows to to_out, copy-free.
# ---------------------------------------------------------------------------


def attn_l2_lnc_reference(q, k, v, bc, bp, relk, sel, exp):
  """jnp reference; q,k (2, N, H*dk) with q pre-scaled, v (2, N, H*dv).
  Returns (out (2, N, H*dv), w (2, N, H))."""
  qn = jnp.transpose(q, (1, 0, 2))
  kn = jnp.transpose(k, (1, 0, 2))
  vn = jnp.transpose(v, (1, 0, 2))
  out, w = attn_l2_reference(qn, kn, vn, bc, bp, relk, sel, exp)
  return (jnp.transpose(out, (1, 0, 2)), jnp.transpose(w, (1, 0, 2)))


def _kernel_lnc(q_ref, k_ref, v_ref, bc_ref, bp_ref, r0_ref, r1_ref,
                s_ref, e_ref, o_ref, w_ref):
  q = q_ref[:]                                   # (2, tn, H*dk)
  tn = q.shape[1]
  qc = (q + bc_ref[0][None, None, :]).astype(jnp.float32)
  qp = (q + bp_ref[0][None, None, :]).astype(jnp.float32)
  k = k_ref[:].astype(jnp.float32)
  dn = (((1,), (0,)), ((), ()))
  # ONE dot for both j logits: subtract the j operands first and
  # reduce the difference (see _kernel)
  diff = (qc * (k[0:1] - k[1:2])
          + qp * (r0_ref[:] - r1_ref[:])[:, None, :])
  ld = jax.lax.dot_general(diff.reshape(2 * tn, -1), s_ref[:], dn,
                           preferred_element_type=jnp.float32)
  w = jax.nn.sigmoid(ld)                         # (2*tn, H)
  wv = jax.lax.dot_general(w, e_ref[:], dn,
                           preferred_element_type=jnp.float32)
  v = v_ref[:].astype(jnp.float32)               # (2, tn, H*dv)
  dv = v.shape[-1]
  v0 = jnp.broadcast_to(v[0:1], (2, tn, dv)).reshape(2 * tn, dv)
  v1 = jnp.broadcast_to(v[1:2], (2, tn, dv)).reshape(2 * tn, dv)
  out = wv * v0 + (1.0 - wv) * v1
  o_ref[:] = out.reshape(2, tn, dv).astype(v_ref.dtype)
  w_ref[:] = w.reshape(2, tn, -1)


@functools.partial(jax.jit, static_argnames=('interpret',))
def attn_l2_lnc_pallas(q, k, v, bc, bp, relk, sel, exp,
                       interpret: bool = False):
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu

  two, n, dqk = q.shape
  dv = v.shape[-1]
  heads = sel.shape[-1]
  relk_j0, relk_j1 = _prep_relk(relk)
  tile_n = _pick_tile_n(n)
  grid = (n // tile_n,)
  row = lambda c: pl.BlockSpec((1, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
  return pl.pallas_call(
      _kernel_lnc, grid=grid,
      in_specs=[
          pl.BlockSpec((2, tile_n, dqk), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((2, tile_n, dqk), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((2, tile_n, dv), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM),
          row(dqk), row(dqk),
          pl.BlockSpec((2, dqk), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((2, dqk), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((dqk, heads), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((heads, dv), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=[
          pl.BlockSpec((2, tile_n, dv), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((2, tile_n, heads), lambda i: (0, i, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_shape=[jax.ShapeDtypeStruct((2, n, dv), v.dtype),
                 jax.ShapeDtypeStruct((2, n, heads), jnp.float32)],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      interpret=interpret,
  )(q, k, v, bc.reshape(1, dqk), bp.reshape(1, dqk),
    relk_j0, relk_j1, sel, exp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def _lnc_core(q, k, v, bc, bp, relk, sel, exp, interpret):
  return attn_l2_lnc_pallas(q, k, v, bc, bp, relk, sel, exp,
                            interpret=interpret)


def _lnc_fwd(q, k, v, bc, bp, relk, sel, exp, interpret):
  out = attn_l2_lnc_pallas(q, k, v, bc, bp, relk, sel, exp,
                           interpret=interpret)
  return out, (q, k, v, bc, bp, relk, sel, exp)


def _lnc_bwd(interpret, res, ct):
  _, vjp = jax.vjp(attn_l2_lnc_reference, *res)
  return vjp(ct)


_lnc_core.defvjp(_lnc_fwd, _lnc_bwd)


def attn_l2_lnc(q, k, v, bc, bp, relk, heads: int,
                use_pallas: bool | None = None):
  """LNC dispatcher. q,k (2, N, H*dk) with q pre-scaled; v
  (2, N, H*dv); bc/bp flattened (H*dk,) biases; relk (3, H*dk)
  distance rows. Returns (out (2, N, H*dv), w (2, N, H))."""
  dqk = q.shape[-1]
  dv = v.shape[-1]
  sel = jnp.asarray(head_selector(heads, dqk // heads), jnp.float32)
  exp = jnp.asarray(head_expander(heads, dv // heads), jnp.float32)
  if use_pallas is None:
    use_pallas = use_pallas_attn_l2()
  ok = (dqk % 128 == 0 and dv % 128 == 0
        and _pick_tile_n(q.shape[1]) > 0)
  if use_pallas and ok:
    return _lnc_core(q, k, v, bc, bp, relk, sel, exp, False)
  return attn_l2_lnc_reference(q, k, v, bc, bp, relk, sel, exp)


def attn_l2(q, k, v, bc, bp, relk, heads: int,
            use_pallas: bool | None = None):
  """Dispatcher. q,k (N, 2, H*dk) with q pre-scaled; v (N, 2, H*dv);
  bc/bp flattened (H*dk,) biases; relk (3, H*dk) distance rows.
  Returns (out (N, 2, H*dv), w (N, 2, H) attn weights at j=0)."""
  dqk = q.shape[-1]
  dv = v.shape[-1]
  sel = jnp.asarray(head_selector(heads, dqk // heads), jnp.float32)
  exp = jnp.asarray(head_expander(heads, dv // heads), jnp.float32)
  if use_pallas is None:
    use_pallas = use_pallas_attn_l2()
  ok = (dqk % 128 == 0 and dv % 128 == 0
        and _pick_tile_n(q.shape[0]) > 0)
  if use_pallas and ok:
    return _fused_core(q, k, v, bc, bp, relk, sel, exp, False)
  return attn_l2_reference(q, k, v, bc, bp, relk, sel, exp)
