"""Device mesh + sharding helpers.

The reference scales with single-node DDP over NCCL
(`engine/trainer.py:194-204`, `utils/dist.py`); the TPU-native equivalent is
a `jax.sharding.Mesh` over ICI with the batch axis sharded and parameters
replicated — XLA inserts the gradient all-reduce. Multi-host extends the same
mesh over DCN via `jax.distributed.initialize()` (see `init_distributed`).

Beyond the reference's DP, the trainer supports a second `model` mesh axis
that shards the FLAT parameter/optimizer vectors (ZeRO/FSDP-style): master
params, Adam moments, the accumulation buffer, and the EMA all live sharded;
the train step all-gathers params once for compute and reduce-scatters the
flat gradient (see `train.trainer.make_train_step(mesh=...)`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    model_parallel: int = 1,
) -> Mesh:
    """Device mesh over the first `n_devices` devices.

    model_parallel=1 (default): 1-D data-parallel mesh `('data',)`.
    model_parallel=k>1: 2-D `('data', 'model')` mesh of shape (n/k, k); the
    'model' axis shards the flat parameter/optimizer state (FSDP/ZeRO).
    Lay the 'model' axis innermost so its collectives ride adjacent-chip ICI.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = list(devices)
    if model_parallel and model_parallel > 1:
        if len(devices) % model_parallel:
            raise ValueError(
                f"model_parallel={model_parallel} must divide device count {len(devices)}"
            )
        arr = np.array(devices).reshape(len(devices) // model_parallel, model_parallel)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    return Mesh(np.array(devices), (DATA_AXIS,))


def fsdp_size(mesh: Mesh) -> int:
    """Size of the parameter-sharding axis (1 when the mesh is DP-only)."""
    return int(dict(mesh.shape).get(MODEL_AXIS, 1))


def flat_param_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (P,) flat parameter/optimizer vectors over MODEL_AXIS."""
    return NamedSharding(mesh, P(MODEL_AXIS))


def train_state_shardings(mesh: Mesh, state: Any) -> Any:
    """Per-leaf shardings for a TrainState: flat (P,)-sized vectors (params,
    EMA, Adam moments, accumulation buffer, group masks) shard over
    MODEL_AXIS; everything else (scalars, batch stats) replicates. With a
    DP-only mesh everything replicates."""
    repl = NamedSharding(mesh, P())
    if fsdp_size(mesh) == 1:
        return jax.tree.map(lambda _: repl, state)
    shard = flat_param_sharding(mesh)
    n = state.params.shape[0]

    def pick(x):
        if getattr(x, "ndim", None) == 1 and x.shape[0] == n:
            return shard
        return repl

    return jax.tree.map(pick, state)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host batch dict on the mesh with the batch axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def init_distributed() -> None:
    """Multi-host init (no-op on a single host)."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
