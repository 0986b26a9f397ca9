"""Plotting utilities.

Rebuild of the reference visualize.py's 14 plot_* functions
(/root/reference/visualize.py) for the subset the SVDD pipeline
actually produces: reward distributions, pred-vs-true scatters,
calibration, per-timestep training curves, attribution logos, and
k-mer spectra comparisons. matplotlib/seaborn, headless-safe.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def _plt():
  import matplotlib
  matplotlib.use('Agg')
  import matplotlib.pyplot as plt
  return plt


def plot_reward_distributions(rewards_by_algo: Dict[str, np.ndarray],
                              ylabel: str = 'reward',
                              save_path: Optional[str] = None):
  """Boxen-style comparison of decode algorithms (eval_simple.ipynb)."""
  plt = _plt()
  import seaborn as sns
  fig, ax = plt.subplots(figsize=(1.6 * len(rewards_by_algo) + 2, 4))
  names = list(rewards_by_algo)
  data = [np.asarray(rewards_by_algo[n]).reshape(-1) for n in names]
  sns.boxenplot(data=data, ax=ax)
  ax.set_xticks(range(len(names)), names, rotation=20)
  ax.set_ylabel(ylabel)
  fig.tight_layout()
  if save_path:
    fig.savefig(save_path, dpi=150)
  return fig


def plot_pred_scatter(y_true: np.ndarray, y_pred: np.ndarray,
                      save_path: Optional[str] = None):
  """Value-net pred vs oracle scatter (eval.py:114-131)."""
  plt = _plt()
  fig, ax = plt.subplots(figsize=(4, 4))
  ax.scatter(np.asarray(y_true), np.asarray(y_pred), s=6, alpha=0.5)
  lo = min(y_true.min(), y_pred.min())
  hi = max(y_true.max(), y_pred.max())
  ax.plot([lo, hi], [lo, hi], 'k--', lw=1)
  ax.set_xlabel('oracle reward')
  ax.set_ylabel('value-net prediction')
  fig.tight_layout()
  if save_path:
    fig.savefig(save_path, dpi=150)
  return fig


def plot_calibration(y_true: np.ndarray, y_pred: np.ndarray,
                     n_bins: int = 10, save_path: Optional[str] = None):
  """Binned calibration curve (visualize.py plot_calibration)."""
  plt = _plt()
  order = np.argsort(y_pred)
  yt, yp = np.asarray(y_true)[order], np.asarray(y_pred)[order]
  bins = np.array_split(np.arange(len(yt)), n_bins)
  xs = [yp[b].mean() for b in bins if len(b)]
  ys = [yt[b].mean() for b in bins if len(b)]
  fig, ax = plt.subplots(figsize=(4, 4))
  ax.plot(xs, ys, 'o-')
  ax.plot([min(xs), max(xs)], [min(xs), max(xs)], 'k--', lw=1)
  ax.set_xlabel('mean predicted')
  ax.set_ylabel('mean observed')
  fig.tight_layout()
  if save_path:
    fig.savefig(save_path, dpi=150)
  return fig


def plot_timestep_curves(losses: Sequence[float],
                         pearsons: Sequence[float],
                         save_path: Optional[str] = None):
  """Per-timestep value-net MSE / Pearson (trainer eval logs)."""
  plt = _plt()
  fig, (a1, a2) = plt.subplots(1, 2, figsize=(9, 3.5))
  a1.plot(losses)
  a1.set_xlabel('timestep')
  a1.set_ylabel('MSE')
  a2.plot(pearsons)
  a2.set_xlabel('timestep')
  a2.set_ylabel('PearsonR')
  fig.tight_layout()
  if save_path:
    fig.savefig(save_path, dpi=150)
  return fig


def plot_attributions(attr: np.ndarray, save_path: Optional[str] = None):
  """Sequence-logo-style attribution plot (visualize.py attribution
  plots; logomaker replaced by a signed stacked bar)."""
  plt = _plt()
  attr = np.asarray(attr)               # (L, 4)
  fig, ax = plt.subplots(figsize=(max(6, attr.shape[0] / 8), 2.5))
  colors = {'A': '#109648', 'C': '#255C99', 'G': '#F7B32B',
            'T': '#D62839'}
  for b, base in enumerate('ACGT'):
    ax.bar(np.arange(attr.shape[0]), attr[:, b],
           color=colors[base], label=base, width=1.0,
           bottom=np.clip(attr[:, :b], 0, None).sum(-1))
  ax.set_xlabel('position')
  ax.set_ylabel('attribution')
  ax.legend(ncol=4, fontsize=7)
  fig.tight_layout()
  if save_path:
    fig.savefig(save_path, dpi=150)
  return fig


def plot_kmer_comparison(counts_a: Dict[str, int],
                         counts_b: Dict[str, int],
                         labels=('generated', 'data'),
                         save_path: Optional[str] = None):
  """k-mer frequency scatter between two sequence sets
  (visualize.py kmer plots / diffusion_gosai.py:522-539 metric)."""
  plt = _plt()
  keys = sorted(set(counts_a) | set(counts_b))
  a = np.array([counts_a.get(k, 0) for k in keys], float)
  b = np.array([counts_b.get(k, 0) for k in keys], float)
  a /= max(a.sum(), 1)
  b /= max(b.sum(), 1)
  fig, ax = plt.subplots(figsize=(4, 4))
  ax.scatter(a, b, s=8)
  hi = max(a.max(), b.max())
  ax.plot([0, hi], [0, hi], 'k--', lw=1)
  ax.set_xlabel(f'{labels[0]} k-mer freq')
  ax.set_ylabel(f'{labels[1]} k-mer freq')
  fig.tight_layout()
  if save_path:
    fig.savefig(save_path, dpi=150)
  return fig
