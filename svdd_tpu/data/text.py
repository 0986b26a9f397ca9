"""Legacy text-MDLM data layer (tokenizers + datasets).

Rebuild of the reference's original Sahoo-et-al pipeline
(/root/reference/dataloader.py: get_dataset :303, get_tokenizer :488 —
openwebtext/lm1b/text8 with HF tokenizers). This container has zero
egress, so:

  * text8-style char-level tokenization is built in (no downloads)
  * HF tokenizers/datasets are used when cached locally, else a clear
    error points at the offline constraint
  * a deterministic synthetic corpus keeps the text pipeline testable

The Diffusion core is vocab-agnostic (config.alphabet_size); text runs
set ``alphabet_size`` to the tokenizer vocab and reuse the same MDLM
losses/samplers, exactly as the reference's diffusion.py twin does.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from svdd_tpu.data.gosai import FaultTolerantIterator


class CharTokenizer:
  """text8-style char-level tokenizer (dataloader.py text8 path)."""

  def __init__(self, alphabet: str = 'abcdefghijklmnopqrstuvwxyz '):
    self.alphabet = alphabet
    self.vocab = {c: i for i, c in enumerate(alphabet)}
    self.inv = {i: c for c, i in self.vocab.items()}

  @property
  def vocab_size(self) -> int:
    return len(self.vocab)

  def encode(self, text: str) -> np.ndarray:
    return np.array([self.vocab[c] for c in text if c in self.vocab],
                    np.int32)

  def decode(self, tokens) -> str:
    return ''.join(self.inv.get(int(t), '?') for t in tokens)

  def batch_decode(self, batch) -> List[str]:
    return [self.decode(row) for row in np.atleast_2d(batch)]


def get_tokenizer(name: str = 'text8'):
  """(dataloader.py get_tokenizer:488). 'text8' is offline-native; HF
  names require a local cache."""
  if name == 'text8':
    return CharTokenizer()
  try:
    from transformers import AutoTokenizer
    return AutoTokenizer.from_pretrained(name, local_files_only=True)
  except Exception as e:
    raise RuntimeError(
        f'tokenizer {name!r} needs a local HF cache; this container '
        f'has no network egress (reference dataloader.py:488)') from e


class TextDataset:
  """Fixed-length token chunks from a raw text file (text8 layout) or
  a deterministic synthetic corpus."""

  def __init__(self, split: str = 'train', length: int = 256,
               path: Optional[str] = None,
               tokenizer: Optional[CharTokenizer] = None,
               synthetic_chars: int = 2 ** 18):
    self.tokenizer = tokenizer or CharTokenizer()
    self.length = length
    if path and os.path.exists(path):
      with open(path) as f:
        text = f.read()
    else:
      rng = np.random.default_rng(abs(hash(('text', split))) % (2**31))
      # markov-ish synthetic text: repeated word pool
      words = ['the', 'of', 'and', 'to', 'in', 'a', 'is', 'that',
               'for', 'it', 'zero', 'one', 'two', 'nine', 'war',
               'city', 'state', 'world', 'time', 'people']
      text = ' '.join(rng.choice(words, synthetic_chars // 5))
    tokens = self.tokenizer.encode(text)
    n_chunks = len(tokens) // length
    self.seqs = tokens[:n_chunks * length].reshape(n_chunks, length)
    self.clss = np.zeros((n_chunks, 1), np.float32)

  def __len__(self):
    return len(self.seqs)

  def __getitem__(self, idx) -> Dict[str, np.ndarray]:
    return {'seqs': self.seqs[idx],
            'attention_mask': np.ones(self.length, np.float32)}


def get_text_dataloaders(config, *, path: Optional[str] = None,
                         num_shards: int = 1, shard_index: int = 0):
  """(dataloader.py get_dataset:303 equivalent)."""
  tok = get_tokenizer('text8')
  per_shard = config.loader.global_batch_size // num_shards

  def make(split, bs, shuffle):
    ds = TextDataset(split, length=config.model.length, path=path,
                     tokenizer=tok)
    return FaultTolerantIterator(ds, bs, shuffle=shuffle,
                                 seed=config.seed,
                                 num_shards=num_shards,
                                 shard_index=shard_index)

  return (make('train', per_shard, True),
          make('val', per_shard, False), tok)
