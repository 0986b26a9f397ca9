"""ConvGRU torch-checkpoint importer (RNA value nets).

Maps the reference ConvGRUTrunk/GRUBlock/ConvHead state dicts
(/root/reference/Enformer.py:1337-1426, 1571-1630, 2131-2173; saved by
trainer.py:73-96 as 'model_state_dict' with keys
``embedding.conv_tower.blocks.{i}.*``, ``embedding.gru_tower.gru.*``,
``head.channel_transform.*``) onto svdd_tpu.models.convgru modules.

The subtle part is torch.nn.GRU's weight layout: ``weight_ih_l0`` is
(3H, in) with gates stacked [r | z | n] — exactly the gate order
GRUCellScan computes — and the bidirectional reverse direction lives
in ``*_reverse`` keys.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def import_gru_cell(sd: Dict[str, np.ndarray], prefix: str = '',
                    reverse: bool = False) -> Dict:
  """torch nn.GRU layer-0 weights -> GRUCellScan params."""
  suffix = '_reverse' if reverse else ''
  w_ih = sd[f'{prefix}weight_ih_l0{suffix}']   # (3H, in)
  w_hh = sd[f'{prefix}weight_hh_l0{suffix}']   # (3H, H)
  b_ih = sd[f'{prefix}bias_ih_l0{suffix}']     # (3H,)
  b_hh = sd[f'{prefix}bias_hh_l0{suffix}']     # (3H,)
  return {
      'ih': {'kernel': np.transpose(w_ih), 'bias': b_ih},
      'hh_kernel': np.transpose(w_hh),
      'hh_bias': b_hh,
  }


def import_bidirectional_gru(sd: Dict[str, np.ndarray],
                             prefix: str = '') -> Dict:
  """torch bidirectional GRU -> {gru_fwd_0, gru_bwd_0} params."""
  return {
      'gru_fwd_0': import_gru_cell(sd, prefix, reverse=False),
      'gru_bwd_0': import_gru_cell(sd, prefix, reverse=True),
  }
