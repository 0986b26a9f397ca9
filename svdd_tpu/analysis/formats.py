"""Sequence format converters.

Rebuild of the reference format.py (/root/reference/format.py:365
convert_input_type and friends): conversions among DNA strings, int
token indices, and one-hot arrays, with type checks. The reference's
genome-interval conversions depend on grelu genome assets that are not
part of the SVDD pipeline; the sequence-level conversions (the ones the
decode/eval paths use) are complete here.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np

from svdd_tpu.data.gosai import (DNA_ALPHABET, batch_dna_detokenize,
                                 dna_tokenize_batch)

SeqLike = Union[str, Sequence[str], np.ndarray]


def get_input_type(x: SeqLike) -> str:
  """'strings' | 'indices' | 'one_hot' (format.py input checks)."""
  if isinstance(x, str) or (
      isinstance(x, (list, tuple)) and x and isinstance(x[0], str)):
    return 'strings'
  arr = np.asarray(x)
  # (.., L, 4) trailing channel axis = one-hot; a float matrix with 4
  # columns also reads as a single one-hot sequence. Int matrices with
  # L==4 are still indices.
  if arr.ndim >= 3 and arr.shape[-1] == 4:
    return 'one_hot'
  if (arr.ndim == 2 and arr.shape[-1] == 4
      and np.issubdtype(arr.dtype, np.floating)):
    return 'one_hot'
  if np.issubdtype(arr.dtype, np.integer):
    return 'indices'
  raise ValueError(f'unrecognized sequence input {type(x)}')


def strings_to_indices(seqs: Union[str, Sequence[str]]) -> np.ndarray:
  if isinstance(seqs, str):
    seqs = [seqs]
  check_strings(seqs)
  return dna_tokenize_batch(list(seqs))


def indices_to_strings(tokens: np.ndarray) -> List[str]:
  tokens = np.atleast_2d(np.asarray(tokens))
  return batch_dna_detokenize(tokens)


def indices_to_one_hot(tokens: np.ndarray) -> np.ndarray:
  tokens = np.asarray(tokens)
  out = np.zeros(tokens.shape + (4,), np.float32)
  valid = (tokens >= 0) & (tokens < 4)
  np.put_along_axis(out, np.clip(tokens, 0, 3)[..., None],
                    valid[..., None].astype(np.float32), axis=-1)
  return out


def one_hot_to_indices(onehot: np.ndarray) -> np.ndarray:
  onehot = np.asarray(onehot)
  idx = onehot.argmax(-1).astype(np.int32)
  # all-zero rows (masked) -> 4, matching transform_samples' inverse
  idx = np.where(onehot.sum(-1) > 0, idx, 4)
  return idx


def convert_input_type(x: SeqLike, output_type: str):
  """Any -> any conversion (format.py convert_input_type:365)."""
  in_type = get_input_type(x)
  if in_type == output_type:
    return x
  if in_type == 'strings':
    idx = strings_to_indices(x)
  elif in_type == 'one_hot':
    idx = one_hot_to_indices(x)
  else:
    idx = np.asarray(x)
  if output_type == 'indices':
    return idx
  if output_type == 'strings':
    return indices_to_strings(idx)
  if output_type == 'one_hot':
    return indices_to_one_hot(idx)
  raise ValueError(f'unknown output type {output_type!r}')


def check_strings(seqs: Sequence[str]) -> None:
  """Alphabet check (format.py check_* helpers)."""
  ok = set(DNA_ALPHABET) | {'N'}
  for s in seqs:
    bad = set(s.upper()) - ok
    if bad:
      raise ValueError(f'invalid characters {bad} in sequence')
