"""Data-parallel device mesh (the reference's entire distributed story).

The reference scales only by DDP/NCCL (Lightning ``DDPPlugin``,
train_yolov3.py:8,69; SURVEY.md §2.7). The TPU-native equivalent is a 1-D
``jax.sharding.Mesh`` over all chips with the batch sharded on the ``data``
axis and parameters replicated: XLA inserts the gradient ``psum`` over ICI
(and DCN across slices) automatically — no process groups, no
``find_unused_parameters``.

These ≤50M-param convnets have no attention/MoE/sequence axis, so TP/PP/SP/EP
are structurally N/A (SURVEY.md §5); DP over the batch is full parity and the
right scaling axis. One deliberate deviation: under a sharded ``jit``,
BatchNorm reduces over the *global* batch (the reference's per-replica DDP
BatchNorm is an artifact of torch's buffer handling, not a design choice);
global stats are deterministic w.r.t. device count and slightly better.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding for inputs."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding for params / optimizer state."""
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh, sharded along the batch axis.

    Single-process: a plain sharded device_put. Multi-process (multi-host
    DP): each host holds only its local slice of the global batch, so the
    global array is assembled from per-process local data — host ``i``'s
    rows land on host ``i``'s devices (the per-host sharded input pipeline of
    SURVEY.md §2.7; DistributedSampler analog)."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
