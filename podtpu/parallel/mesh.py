"""Device meshes and shardings (the reference's entire distributed story+).

The reference scales only by DDP/NCCL (Lightning ``DDPPlugin``,
train_yolov3.py:8,69; SURVEY.md §2.7). The TPU-native equivalent is a
``jax.sharding.Mesh`` over all chips with the batch sharded on the ``data``
axis and parameters replicated: XLA inserts the gradient ``psum`` over ICI
(and DCN across slices) automatically — no process groups, no
``find_unused_parameters``.

These ≤50M-param convnets have no attention/MoE/sequence axis, so TP/PP/EP
are structurally N/A (SURVEY.md §5); DP over the batch is the parity axis.
Beyond parity, two more TPU-native sharding modes compose with DP:

* **FSDP** (``state_shardings(..., fsdp=True)``): parameters + optimizer
  state + gradients sharded over the ``data`` axis at rest (ZeRO-3 layout).
  GSPMD inserts the per-layer ``all_gather`` before use and turns the
  gradient ``psum`` into a ``reduce_scatter`` — same math, 1/N the per-chip
  state memory.
* **Spatial partitioning** (``make_mesh(spatial=k)``): activations sharded
  along image height on a second ``space`` mesh axis — the conv analog of
  sequence parallelism. GSPMD emits halo exchanges (``ppermute``) for the
  conv windows. This is how a single *sample* larger than one chip's HBM
  (big input_size) trains across chips.

One deliberate deviation: under a sharded ``jit``, BatchNorm reduces over
the *global* batch (the reference's per-replica DDP BatchNorm is an artifact
of torch's buffer handling, not a design choice); global stats are
deterministic w.r.t. device count and slightly better.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(devices=None, spatial: int = 1) -> Mesh:
    """Device mesh: 1-D ``(data,)``, or 2-D ``(data, space)`` if spatial>1.

    ``spatial`` chips cooperate on each image's height dimension (spatial
    partitioning); the remaining factor is the data-parallel axis.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if spatial <= 1:
        return Mesh(devices, (DATA_AXIS,))
    if devices.size % spatial != 0:
        raise ValueError(
            f"{devices.size} devices not divisible by spatial={spatial}")
    return Mesh(devices.reshape(devices.size // spatial, spatial),
                (DATA_AXIS, SPACE_AXIS))


def spatial_size(mesh: Mesh) -> int:
    return mesh.shape.get(SPACE_AXIS, 1)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding for inputs."""
    return NamedSharding(mesh, P(DATA_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC image batches: N over ``data``, H over ``space`` (if present)."""
    if spatial_size(mesh) > 1:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding for params / optimizer state."""
    return NamedSharding(mesh, P())


def _fsdp_spec(shape: tuple, n: int, min_elems: int) -> P:
    """Shard the largest ``data``-divisible dim of a leaf; else replicate.

    Leaves smaller than ``min_elems`` stay replicated — gathering BN scales
    and 1x1-conv tails costs more latency than their bytes are worth.
    """
    if not shape or int(np.prod(shape)) < min_elems:
        return P()
    for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if shape[i] >= n and shape[i] % n == 0:
            spec = [None] * len(shape)
            spec[i] = DATA_AXIS
            return P(*spec)
    return P()


def state_shardings(mesh: Mesh, state, fsdp: bool = False,
                    min_shard_elems: int = 2 ** 14):
    """Per-leaf sharding pytree for a TrainState (or any pytree).

    ``fsdp=False``: everything replicated (pure DP — reference parity).
    ``fsdp=True``: ZeRO-3 layout — every large param/momentum/batch-stat
    leaf sharded over the ``data`` axis (its largest divisible dim, so conv
    kernels split on C_out), small leaves replicated. Pass the result to
    ``jax.device_put`` and to the steps' ``state_shardings=`` so params,
    optimizer state, and gradients live sharded at rest.
    """
    n = mesh.shape[DATA_AXIS]
    repl = NamedSharding(mesh, P())

    def leaf(x):
        if not fsdp:
            return repl
        shape = tuple(getattr(x, "shape", ()) or ())
        return NamedSharding(mesh, _fsdp_spec(shape, n, min_shard_elems))

    return jax.tree_util.tree_map(leaf, state)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh, sharded along the batch axis.

    Single-process: a plain sharded device_put. Multi-process (multi-host
    DP): each host holds only its local slice of the global batch, so the
    global array is assembled from per-process local data — host ``i``'s
    rows land on host ``i``'s devices (the per-host sharded input pipeline of
    SURVEY.md §2.7; DistributedSampler analog). Under a spatial mesh the
    ``img`` leaf additionally shards H over ``space``."""
    shardings = {k: image_sharding(mesh) if k == "img" else
                 batch_sharding(mesh) for k in batch}
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(
                shardings[k], np.asarray(v))
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
