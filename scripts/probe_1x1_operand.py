"""Why do the 1x1 residual-conv dots run at 155 TF/s (19 ms/step)?

Theory: XLA fuses the preceding BN-affine + gelu_enformer into the
dot's operand read (NACDR puts norm+act before the conv), throttling
the MXU feed. Measure the same dot with (a) clean operand, (b) gelu
operand, (c) affine+gelu operand.

Also: LNC mega-kernel tile_n sweep per tower-block shape.

Timing: fetch only a tiny scalar per round — fetching full outputs
through the axon tunnel costs ~1.4 s/GB and swamps the op. Dots are
timed as sum() epilogues (cannot be slice-pushed); Pallas outputs are
timed with a [0,0,0] fetch (custom calls are opaque to DCE).
"""
import functools
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

N = 5120


def timeit(fn, *args, iters=10):
  np.asarray(fn(*args))                       # compile + warmup
  best = float('inf')
  for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(iters - 1):
      fn(*args)
    np.asarray(fn(*args))                     # tiny fetch, drains queue
    best = min(best, (time.perf_counter() - t0) / iters)
  return best


def gelu_e(x):
  return x * jax.nn.sigmoid(1.702 * x)


def main():
  key = jax.random.key(0)
  l, c = 100, 768
  m = l * N
  x = jax.random.normal(key, (m, c), jnp.bfloat16)
  w = jax.random.normal(jax.random.fold_in(key, 1), (c, c),
                        jnp.bfloat16) * 0.02
  s = jax.random.normal(jax.random.fold_in(key, 2), (c,),
                        jnp.float32) * 0.1 + 1.0
  t = jax.random.normal(jax.random.fold_in(key, 3), (c,),
                        jnp.float32) * 0.1
  flops = 2 * m * c * c

  def report(name, fn):
    dt = timeit(fn, x, w)
    print(f'{name:18s} {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s',
          flush=True)

  report('clean dot', jax.jit(lambda a, b: jnp.sum(jnp.dot(
      a, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
      .astype(jnp.float32))))
  report('gelu dot', jax.jit(lambda a, b: jnp.sum(jnp.dot(
      gelu_e(a.astype(jnp.float32)).astype(jnp.bfloat16), b,
      preferred_element_type=jnp.float32).astype(jnp.bfloat16)
      .astype(jnp.float32))))
  report('affine+gelu dot', jax.jit(lambda a, b: jnp.sum(jnp.dot(
      gelu_e(a.astype(jnp.float32) * s + t).astype(jnp.bfloat16), b,
      preferred_element_type=jnp.float32).astype(jnp.bfloat16)
      .astype(jnp.float32))))
  report('bf16 gelu dot', jax.jit(lambda a, b: jnp.sum(jnp.dot(
      a * jax.nn.sigmoid(jnp.bfloat16(1.702) * a), b,
      preferred_element_type=jnp.float32).astype(jnp.bfloat16)
      .astype(jnp.float32))))

  # --- LNC mega kernel tile sweep ---------------------------------
  from svdd_tpu.ops import attn_pool_pallas as ap
  blocks = [
      ('b1', 200, 768),
      ('b2', 100, 768),
      ('b3', 52, 896),
      ('b4', 26, 1024),
      ('b5', 14, 1152),
      ('b6', 8, 1280),
  ]
  orig_pick = ap._pick_tile_n_lnc
  for name, lb, cb in blocks:
    xb = jax.random.normal(key, (lb, N, cb), jnp.bfloat16)
    rb = jax.random.normal(jax.random.fold_in(key, 7), (lb, N, cb),
                           jnp.bfloat16)
    wb = jax.random.normal(jax.random.fold_in(key, 8), (cb, cb),
                           jnp.bfloat16) * 0.02
    sb = jnp.ones((cb,), jnp.float32)
    tb = jnp.zeros((cb,), jnp.float32)
    cur = orig_pick(N, lb, cb, k_live=5, has_res=True)
    row = [f'{name} l={lb} c={cb} cur={cur}:']
    for cand in (8, 16, 32, 64):
      if N % cand:
        continue
      ap._pick_tile_n_lnc = lambda *a, _c=cand, **k: _c
      try:
        mega = functools.partial(
            ap.pool_prologue_im2col_wlogits_lnc_pallas,
            k_taps=5, act='gelu_enformer', mask_tail=True,
            pad_out=False)
        # weights as jit ARGUMENTS (CLAUDE.md: closed-over weights
        # inline as HLO constants -> transport breakage + lets XLA
        # constant-fold the operand feed being timed)
        fn = jax.jit(
            lambda xx, rr, ww, ss, tt, _m=mega:
            _m(xx, ww, ss, tt, residual=rr)[:1, :1, :1])
        dt = timeit(fn, xb, rb, wb, sb, tb)
        gb = (xb.size * 2 * 2
              + lb // 2 * N * 5 * cb * 2) / 1e9
        row.append(f'tile{cand}={dt*1e3:6.3f}ms({gb/dt:5.0f}GB/s)')
      except Exception as e:                       # noqa: BLE001
        row.append(f'tile{cand}=FAIL({type(e).__name__})')
      finally:
        ap._pick_tile_n_lnc = orig_pick
    print(' '.join(row), flush=True)


if __name__ == '__main__':
  main()
