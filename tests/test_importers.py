"""Numerical parity: reference torch architectures vs svdd_tpu flax
models, weights carried by the importers.

This is the golden-value strategy SURVEY.md §4 calls for: the
reference's CNNModel (loaded directly from /root/reference, which
depends only on torch) runs under torch-CPU with random weights; the
importer maps its state dict into our flax CNN; outputs must agree to
float tolerance. This pins every layout/order/activation decision in
svdd_tpu.models.cnn to the reference architecture.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')


def _load_reference_dnaconv():
  sys.path.insert(0, '/root/reference')
  try:
    from models import dnaconv  # type: ignore
    return dnaconv
  finally:
    sys.path.pop(0)


def test_cnn_parity_with_reference():
  dnaconv = _load_reference_dnaconv()
  args = types.SimpleNamespace(
      clean_data=False, hidden_dim=32, num_cnn_stacks=1, dropout=0.0,
      cls_free_guidance=False)
  torch.manual_seed(0)
  tmodel = dnaconv.CNNModel(args, alphabet_size=5, num_cls=3)
  tmodel.eval()

  B, L = 3, 24
  rng = np.random.default_rng(0)
  seq = rng.integers(0, 5, size=(B, L))
  sigma = np.zeros(B, np.float32)
  with torch.no_grad():
    t_out = tmodel(torch.tensor(seq), torch.tensor(sigma)).numpy()

  from svdd_tpu.config import tiny_test_config
  from svdd_tpu.models.cnn import CNNModel
  from svdd_tpu.importers.cnn import import_cnn_params
  import jax.numpy as jnp

  cfg = tiny_test_config('rna')
  cfg.model.hidden_dim = 32
  cfg.model.num_cnn_stacks = 1
  cfg.model.length = L
  jmodel = CNNModel(config=cfg, alphabet_size=5, num_cls=3)
  sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
  variables = import_cnn_params(sd, num_layers=5)
  j_out = np.asarray(
      jmodel.apply(variables, jnp.asarray(seq), jnp.asarray(sigma)))

  np.testing.assert_allclose(j_out, t_out, atol=2e-4)


def test_cnn_parity_forward2_onehot():
  """forward2 (one-hot input) parity — the DPS gradient path."""
  dnaconv = _load_reference_dnaconv()
  args = types.SimpleNamespace(
      clean_data=False, hidden_dim=32, num_cnn_stacks=1, dropout=0.0,
      cls_free_guidance=False)
  torch.manual_seed(1)
  tmodel = dnaconv.CNNModel(args, alphabet_size=5, num_cls=3)
  tmodel.eval()
  B, L = 2, 16
  rng = np.random.default_rng(1)
  onehot = rng.random((B, L, 5)).astype(np.float32)
  sigma = np.zeros(B, np.float32)
  with torch.no_grad():
    t_out = tmodel.forward2(torch.tensor(onehot),
                            torch.tensor(sigma)).numpy()

  from svdd_tpu.config import tiny_test_config
  from svdd_tpu.models.cnn import CNNModel
  from svdd_tpu.importers.cnn import import_cnn_params
  import jax.numpy as jnp

  cfg = tiny_test_config('rna')
  cfg.model.hidden_dim = 32
  cfg.model.num_cnn_stacks = 1
  cfg.model.length = L
  jmodel = CNNModel(config=cfg, alphabet_size=5, num_cls=3)
  sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
  variables = import_cnn_params(sd, num_layers=5)
  j_out = np.asarray(jmodel.apply(
      variables, jnp.zeros((B, L), jnp.int32), jnp.asarray(sigma),
      x_onehot=jnp.asarray(onehot)))
  np.testing.assert_allclose(j_out, t_out, atol=2e-4)


def test_gru_parity_with_torch():
  """GRUCellScan + importer vs torch.nn.GRU (bidirectional, summed
  directions as GRUBlock does at Enformer.py:1620)."""
  import jax
  import jax.numpy as jnp
  from svdd_tpu.models.convgru import GRUCellScan
  from svdd_tpu.importers.convgru import import_gru_cell

  torch.manual_seed(0)
  H, IN, B, L = 6, 5, 2, 7
  tgru = torch.nn.GRU(input_size=IN, hidden_size=H, batch_first=True,
                      bidirectional=True)
  x = torch.randn(B, L, IN)
  with torch.no_grad():
    t_out, _ = tgru(x)
  t_sum = (t_out[:, :, :H] + t_out[:, :, H:]).numpy()

  sd = {k: v.detach().numpy() for k, v in tgru.state_dict().items()}
  fwd = GRUCellScan(hidden_size=H, reverse=False)
  bwd = GRUCellScan(hidden_size=H, reverse=True)
  xj = jnp.asarray(x.numpy())
  out_f = fwd.apply({'params': import_gru_cell(sd)}, xj)
  out_b = bwd.apply({'params': import_gru_cell(sd, reverse=True)}, xj)
  j_sum = np.asarray(out_f + out_b)
  np.testing.assert_allclose(j_sum, t_sum, atol=1e-5)
