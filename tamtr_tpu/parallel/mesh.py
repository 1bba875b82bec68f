"""Device mesh + sharding helpers.

The reference scales with single-node DDP over NCCL
(`engine/trainer.py:194-204`, `utils/dist.py`); the TPU-native equivalent is
a `jax.sharding.Mesh` over ICI with the batch axis sharded and parameters
replicated — XLA inserts the gradient all-reduce. Multi-host extends the same
mesh over DCN via `jax.distributed.initialize()` (see `init_distributed`).

Beyond the reference's DP, the trainer supports ZeRO-1 sharding of the FLAT
parameter/optimizer vectors over the SAME 'data' axis (config `fsdp>1`):
master params, Adam moments, the accumulation buffer, and the EMA live
sharded n-ways; the train step all-gathers params once for compute and
reduce-scatters the flat gradient. Because the shard axis IS the data axis,
ZeRO costs no data-parallel throughput — every device still computes a
distinct batch shard (a 2-D data x model mesh would replicate the forward/
backward compute k-fold for the same memory win).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SP_AXIS = "sp"


def make_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
    sp: int = 1,
) -> Mesh:
    """Device mesh for the trainer.

    sp=1 (default): 1-D data-parallel mesh `('data',)`. Both DP and ZeRO-1
    run on it: the batch shards over 'data', and (with ZeRO on) the flat
    optimizer state shards over the same axis.

    sp>1: 2-D `('data', 'sp')` mesh — the batch shards over 'data', the
    SS2D token axes shard over 'sp' (activate with
    `nn.ssm.sequence_parallel(mesh)`), and ZeRO flat vectors shard over
    BOTH axes flattened (n_devices-way). SURVEY §5.7's composition of the
    DP/ZeRO step with the sequence-parallel scan.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.array(list(devices))
    if sp > 1:
        assert len(devices) % sp == 0, f"{len(devices)} devices not divisible by sp={sp}"
        return Mesh(devices.reshape(len(devices) // sp, sp), (DATA_AXIS, SP_AXIS))
    return Mesh(devices, (DATA_AXIS,))


def data_size(mesh: Mesh) -> int:
    """Number of data-parallel devices in the mesh."""
    return int(dict(mesh.shape).get(DATA_AXIS, 1))


def flat_param_sharding(mesh: Mesh) -> NamedSharding:
    """ZeRO sharding for (P,) flat parameter/optimizer vectors: over ALL
    mesh axes flattened — the data axis on the 1-D mesh, (data, sp) jointly
    on the 2-D mesh, so optimizer-state memory always drops by the full
    device count (PAD_MULTIPLE-padded vectors divide evenly for any
    power-of-2 device count; XLA pads internally otherwise)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def train_state_shardings(mesh: Mesh, state: Any, zero: bool = False) -> Any:
    """Per-leaf shardings for a TrainState.

    zero=False (plain DP): everything replicates.
    zero=True: flat (P,)-sized vectors (params, EMA, Adam moments,
    accumulation buffer, group masks) shard over the data axis (ZeRO-1);
    scalars and batch stats replicate.
    """
    repl = NamedSharding(mesh, P())
    if not zero or mesh.devices.size == 1:
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
