"""Mesh + sharding rules reproducing (and exceeding) the reference's
distributed strategies.

Reference parallelism inventory (SURVEY.md §2.2) is data-parallel only:
Lightning DDP / FSDP(SHARD_GRAD_OP) / torch DataParallel / NCCL process
groups. The TPU-native mapping:

  DDP / DataParallel     -> batch sharded over the 'data' mesh axis;
                            pjit inserts the gradient psum (the NCCL
                            all-reduce equivalent) over ICI.
  FSDP SHARD_GRAD_OP     -> params + optimizer state sharded over
                            'data' (fsdp_shard), gathered per-layer by
                            XLA at use (all_gather) — ZeRO-2/3 style.
  distributed sampler    -> FaultTolerantIterator shards by
                            process_index (data/gosai.py).
  NCCL bootstrap         -> none needed; jax.distributed.initialize()
                            on multi-host.

Plus a 'model' axis the reference lacks: tensor-parallel sharding of
the 1536-wide Enformer matmuls and of the fully-sharded B*M candidate
dimension at decode.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
MODEL_AXIS = 'model'


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[list] = None) -> Mesh:
  """Create a ('data', 'model') mesh. data=-1 uses all remaining
  devices. Axis order puts 'model' innermost so TP collectives ride
  the fastest ICI links."""
  devices = devices if devices is not None else jax.devices()
  n = len(devices)
  if data == -1:
    if n % model:
      raise ValueError(f'{n} devices not divisible by model={model}')
    data = n // model
  if data * model != n:
    raise ValueError(f'mesh {data}x{model} != {n} devices')
  dev_array = np.asarray(devices).reshape(data, model)
  return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
  """Shard the leading batch dim over 'data' (DDP semantics)."""
  return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
  """Device_put a host batch with the leading dim over 'data'."""
  def put(x):
    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))
  return jax.tree.map(put, batch)


def fsdp_spec(x: Any, mesh: Mesh, min_size: int = 2 ** 14) -> P:
  """FSDP rule: shard the FIRST (major-most) divisible axis of big
  params over 'data'; small params stay replicated (matches
  SHARD_GRAD_OP's grad/opt-state sharding intent,
  configs_gosai/strategy/fsdp.yaml).

  Major-most matters: shards of the leading axis are CONTIGUOUS in the
  row-major layout, so XLA's all-gather-at-use / grad-reduce lower
  cleanly. The r3 rule (largest axis, often the minor-most channel
  dim) forced strided gathers that XLA implemented as all-to-all +
  collective-permute chains — 57.0 MB/step vs 2.45 MB/step for this
  rule on the identical train step (scripts/probe_fsdp_spec.py,
  HLO-counted on the virtual 8-device mesh; 23x less traffic). This
  also naturally shards nn.scan-stacked layer params on the layer
  axis (one layer group per device), the cheapest ZeRO layout."""
  n_data = mesh.shape[DATA_AXIS]
  if x.ndim == 0 or x.size < min_size:
    return P()
  cands = [i for i, dim in enumerate(x.shape) if dim % n_data == 0]
  if not cands:
    return P()
  spec = [None] * x.ndim
  spec[cands[0]] = DATA_AXIS
  return P(*spec)


def fsdp_shard(tree: Any, mesh: Mesh, min_size: int = 2 ** 14) -> Any:
  """Apply fsdp_spec to every leaf and device_put."""
  return jax.tree.map(
      lambda x: jax.device_put(
          x, NamedSharding(mesh, fsdp_spec(x, mesh, min_size))), tree)


def fsdp_shardings(tree: Any, mesh: Mesh,
                   min_size: int = 2 ** 14) -> Any:
  return jax.tree.map(
      lambda x: NamedSharding(mesh, fsdp_spec(x, mesh, min_size)), tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
  return jax.tree.map(
      lambda x: jax.device_put(x, replicated(mesh)), tree)


def candidate_sharding(mesh: Mesh) -> NamedSharding:
  """Shard the FLAT (B*M, ...) candidate batch over ALL mesh devices
  (data AND model axes). The guided step's value/reward forward is
  row-independent, so splitting the folded candidate dim across every
  device scales it with zero intra-layer collectives — only the tiny
  (B, M) score gather at the argmax select crosses devices. This is the
  'fully-sharded B*M candidate dim' promised above."""
  return NamedSharding(mesh, P((DATA_AXIS, MODEL_AXIS), None))


def _tp_dim(shape, dim: int, n_model: int) -> Optional[P]:
  if n_model <= 1 or not shape:
    return None
  dim = dim % len(shape)
  if shape[dim] % n_model:
    return None
  spec = [None] * len(shape)
  spec[dim] = MODEL_AXIS
  return P(*spec)


def tp_value_spec(path_names: tuple, leaf, n_model: int) -> P:
  """Megatron-style tensor-parallel PartitionSpec for one Enformer
  value-net parameter (path from tree_flatten_with_path).

  The transformer tower + pointwise head carry the 1536-wide matmuls
  (mesh docstring above); they get the classic column/row alternation
  so each block needs exactly one psum after attention and one after
  the FFN (inserted by GSPMD):

    to_q/to_k/to_v/to_rel_k  : column (head dim)    + rel biases on h
    to_out                   : row
    FFN LinearBlock_0 Dense  : column (+bias)
    FFN LinearBlock_1 Dense  : row
    pointwise conv           : column (+bias)
    ConvHead 1x1 conv        : row

  The conv tower stays replicated BY DESIGN: channel-sharding its convs
  would all-gather a full (B*M, L, C) activation per layer over ICI —
  orders of magnitude more bytes than the Megatron psums — while the
  candidate-dim sharding already scales it with zero comms. Handles the
  nn.scan leading stacked-layer dim transparently (rules index dims
  from the END)."""
  names = [str(n) for n in path_names]
  joined = '/'.join(names)
  shape = getattr(leaf, 'shape', ())

  def col():
    return _tp_dim(shape, -1, n_model)
  def row():
    return _tp_dim(shape, -2, n_model)

  spec = None
  if names[-1] == 'kernel':
    if any(k in names for k in ('to_q', 'to_k', 'to_v', 'to_rel_k')):
      spec = col()
    elif 'to_out' in names:
      spec = row()
    elif 'LinearBlock_0' in joined and 'Dense_0' in names:
      spec = col()
    elif 'LinearBlock_1' in joined and 'Dense_0' in names:
      spec = row()
    elif 'pointwise' in names and 'Conv1D_0' in names:
      spec = col()
    elif 'ConvHead_0' in joined and len(shape) >= 2:
      spec = row()
  elif names[-1] == 'bias':
    if ('LinearBlock_0' in joined and 'Dense_0' in names) or \
       ('pointwise' in names and 'Conv1D_0' in names):
      spec = col()
  elif names[-1] in ('rel_content_bias', 'rel_pos_bias'):
    spec = _tp_dim(shape, -3, n_model)      # (..., 1, h, 1, dk)
  return spec if spec is not None else P()


def tp_value_shardings(variables: Any, mesh: Mesh) -> Any:
  """NamedSharding tree for tensor-parallel Enformer value params."""
  from jax.tree_util import tree_flatten_with_path, tree_unflatten
  n_model = mesh.shape[MODEL_AXIS]
  flat, treedef = tree_flatten_with_path(variables)
  specs = [NamedSharding(
      mesh, tp_value_spec(tuple(getattr(k, 'key', getattr(k, 'idx', k))
                                for k in path), leaf, n_model))
           for path, leaf in flat]
  return tree_unflatten(treedef, specs)


def tp_shard_value_params(variables: Any, mesh: Mesh) -> Any:
  """device_put value-net variables with Megatron TP shardings."""
  shardings = tp_value_shardings(variables, mesh)
  return jax.tree.map(jax.device_put, variables, shardings)


def local_shard_info(mesh: Optional[Mesh] = None):
  """(num_shards, shard_index) for the data iterator: one shard per
  process (multi-host), all devices fed via shard_batch."""
  return jax.process_count(), jax.process_index()


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
  """Multi-host bootstrap.

  The NCCL/mp.spawn bootstrap the reference hand-rolls
  (train.py:36-45, 295-300) collapses to jax.distributed.initialize():
  on TPU pods the coordinator is discovered from the environment; the
  explicit args cover DCN-connected CPU/GPU testing. Safe to call when
  already initialized or single-process.
  """
  explicit = coordinator_address is not None or num_processes is not None
  try:
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
  except ValueError:
    if explicit:
      raise   # a deliberate multi-host run must not silently degrade
    pass   # single-process context: no coordinator to discover
  except RuntimeError as e:
    # Two distinct RuntimeErrors land here:
    #  - 'already initialized': benign — the docstring's 'safe to call
    #    when already initialized' case; pass silently.
    #  - backend already used before initialize: a would-be multi-host
    #    run would silently degrade to independent per-host training.
    #    With explicit multi-host args that is a correctness failure —
    #    raise; on the no-args auto-discovery path, warn and continue.
    if 'already initialized' in str(e).lower():
      return
    if explicit:
      raise RuntimeError(
          'jax.distributed.initialize failed for an explicit multi-host '
          'run; refusing to continue as independent single-process '
          'training. initialize_multihost must run BEFORE any JAX '
          f'computation (original error: {e})') from e
    import logging
    logging.getLogger(__name__).warning(
        'jax.distributed.initialize failed (%s); continuing '
        'single-process. If this host was meant to join a multi-host '
        'slice, ensure initialize_multihost runs BEFORE any JAX '
        'computation.', e)
