"""Interpretability: ISM, gradient attributions, attention maps.

Rebuild of the reference score.py (/root/reference/score.py): ISM
(:18-113), captum-based attributions deepshap/IG/inputxgrad (:115-247),
TF-MoDISco hook (:249-390), attention-score extraction (:393-437).

TPU-native: ISM is one batched predict over all L*3 single-base
mutants (folded into the batch dim, one forward); attributions use
jax.grad/vmap directly — no captum. DeepSHAP is approximated by
expected gradients over shuffled references (the same estimator family
captum's GradientShap uses).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray
PredictFn = Callable[[Array], Array]   # (N, L, 4) one-hot -> (N,)


def ism_predict(predict_fn: PredictFn, onehot: Array,
                batch_size: int = 512) -> np.ndarray:
  """In-silico mutagenesis (score.py ISM_predict:18-113).

  onehot: (L, 4) single sequence. Returns (L, 4) matrix of predictions
  with base b substituted at position l (reference ISM output shape).
  All 4L mutants run as batched forwards.
  """
  L = onehot.shape[0]
  eye = jnp.eye(4)
  # mutants[l, b] = onehot with row l replaced by base b
  mutants = jnp.tile(onehot[None, None], (L, 4, 1, 1))
  idx_l = jnp.arange(L)
  mutants = mutants.at[idx_l[:, None], jnp.arange(4)[None, :],
                       idx_l[:, None]].set(eye[None])
  flat = mutants.reshape(L * 4, L, 4)
  preds = []
  for i in range(0, L * 4, batch_size):
    preds.append(np.asarray(predict_fn(flat[i:i + batch_size])))
  return np.concatenate(preds).reshape(L, 4)


def input_x_gradient(predict_fn: PredictFn, onehot: Array) -> Array:
  """input*grad attribution (score.py get_attributions
  method='inputxgradient')."""
  grad = jax.grad(lambda x: predict_fn(x[None])[0])(onehot)
  return grad * onehot


def integrated_gradients(predict_fn: PredictFn, onehot: Array,
                         steps: int = 32,
                         baseline: Optional[Array] = None) -> Array:
  """IG attribution (score.py method='integratedgradients')."""
  if baseline is None:
    baseline = jnp.full_like(onehot, 0.25)
  alphas = jnp.linspace(0.0, 1.0, steps)
  path = baseline[None] + alphas[:, None, None] * (onehot
                                                   - baseline)[None]
  grads = jax.vmap(
      jax.grad(lambda x: predict_fn(x[None])[0]))(path)
  return (onehot - baseline) * grads.mean(axis=0)


def expected_gradients(predict_fn: PredictFn, onehot: Array,
                       key: jax.Array, n_refs: int = 20) -> Array:
  """GradientShap-style attribution vs dinucleotide-shuffled references
  (score.py method='deepshap' with shuffled refs :166-190)."""
  L = onehot.shape[0]
  keys = jax.random.split(key, n_refs)

  def one_ref(k):
    k1, k2 = jax.random.split(k)
    perm = jax.random.permutation(k1, L)
    ref = onehot[perm]
    alpha = jax.random.uniform(k2)
    point = ref + alpha * (onehot - ref)
    g = jax.grad(lambda x: predict_fn(x[None])[0])(point)
    return (onehot - ref) * g

  return jax.vmap(one_ref)(keys).mean(axis=0)


def get_attributions(predict_fn: PredictFn, onehot: Array,
                     method: str = 'deepshap',
                     key: Optional[jax.Array] = None,
                     **kwargs) -> np.ndarray:
  """Dispatch matching score.py get_attributions:115-247."""
  if method == 'deepshap':
    key = key if key is not None else jax.random.key(0)
    out = expected_gradients(predict_fn, onehot, key, **kwargs)
  elif method == 'integratedgradients':
    out = integrated_gradients(predict_fn, onehot, **kwargs)
  elif method == 'inputxgradient':
    out = input_x_gradient(predict_fn, onehot)
  elif method == 'ism':
    ism = ism_predict(predict_fn, onehot)
    ref = float(predict_fn(onehot[None])[0])
    out = jnp.asarray(ism - ref) * onehot
  else:
    raise NotImplementedError(method)
  return np.asarray(out)


def run_modisco(attributions: np.ndarray, onehots: np.ndarray,
                out_dir: str = './modisco', **kwargs):
  """TF-MoDISco motif discovery (score.py run_modisco:249-390).
  Requires the optional `modiscolite` package (not in this image);
  raises ImportError with guidance otherwise."""
  try:
    import modiscolite  # noqa: F401
  except ImportError as e:
    raise ImportError(
        'modiscolite is not installed in this environment; install it '
        'to run motif discovery (reference score.py:249)') from e
  pos_patterns, neg_patterns = modiscolite.tfmodisco.TFMoDISco(
      hypothetical_contribs=attributions.transpose(0, 2, 1),
      one_hot=onehots.transpose(0, 2, 1), **kwargs)
  return pos_patterns, neg_patterns


def get_attention_scores(module, variables, onehot: Array,
                         block_idx: Optional[int] = None) -> np.ndarray:
  """Attention-map extraction (score.py get_attention_scores:393-437).

  Applies an Enformer value/trunk module with
  ``mutable=['intermediates']``; EnformerAttention sows its softmax
  weights (models/enformer.py). Returns (Layers, Heads, L', L') for a
  single input sequence (batch squeezed), or (Heads, L', L') when
  ``block_idx`` selects one transformer layer — the reference's exact
  return contract.
  """
  if onehot.ndim == 2:
    onehot = onehot[None]
  _, inter = module.apply(variables, onehot, mutable=['intermediates'])

  import re

  def natkey(s):
    return [int(t) if t.isdigit() else t
            for t in re.split(r'(\d+)', str(s))]

  maps = []
  def collect(tree):
    if isinstance(tree, dict):
      for k in sorted(tree, key=natkey):
        if k == 'attention':
          maps.extend(tree[k] if isinstance(tree[k], (tuple, list))
                      else [tree[k]])
        else:
          collect(tree[k])
  collect(inter)
  if not maps:
    raise ValueError('no attention maps sown — module has no '
                     'EnformerAttention layers')
  stacked = []
  for m in maps:
    m = np.asarray(m)
    # scan-over-layers tower sows one stacked (Layers, B, H, L, L);
    # unscanned towers sow (B, H, L, L) per block
    stacked.extend(m if m.ndim == 5 else [m])
  attn = np.stack(stacked)                     # (Layers, B, H, L, L)
  if attn.shape[1] == 1:
    attn = attn[:, 0]                          # reference squeeze(0)
  return attn[block_idx] if block_idx is not None else attn
