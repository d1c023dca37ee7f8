"""Device mesh construction and batch/param placement.

TPU-native replacement for the reference's Lightning-DDP/NCCL layer
(reference: main.py:51-58 — ``pl.Trainer(strategy='ddp')``; SURVEY §2.9):
instead of one process per accelerator with hand-managed all-reduce, a single
GSPMD program runs over a ``jax.sharding.Mesh`` with axes:

- ``data``  — batch-sharded data parallelism (gradients all-reduce over ICI,
  inserted by XLA; the reference's NCCL all-reduce equivalent)
- ``model`` — tensor parallelism for large stage-2 priors (qkv/FFN kernels
  column/row sharded)

Multi-host: call :func:`init_distributed` (jax.distributed.initialize) before
building the mesh; the mesh then spans all processes' devices.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host init (the reference's `-nn num_nodes`, main.py:20)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(data: Optional[int] = None, model: int = 1,
              pipe: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model[, pipe]) mesh over all (or the given) devices.

    The ``pipe`` axis (pipeline-parallel stages, parallel/pipeline.py) is
    only materialised when > 1, so existing 2-axis meshes/specs are
    unchanged."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // (model * pipe)
    assert data * model * pipe == n, \
        f"mesh {data}x{model}x{pipe} != {n} devices"
    if pipe == 1:
        arr = np.asarray(devices).reshape(data, model)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    arr = np.asarray(devices).reshape(data, model, pipe)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, PIPE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with batch dim sharded over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def is_main_process() -> bool:
    """The reference's rank_zero_only gate (callback.py:56)."""
    return jax.process_index() == 0
