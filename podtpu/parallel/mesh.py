"""Device meshes and shardings (the reference's entire distributed story+).

The reference scales only by DDP/NCCL (Lightning ``DDPPlugin``,
train_yolov3.py:8,69; SURVEY.md §2.7). The TPU-native equivalent is a
``jax.sharding.Mesh`` over all chips with the batch sharded on the ``data``
axis and parameters replicated: XLA inserts the gradient ``psum`` over ICI
(and DCN across slices) automatically — no process groups, no
``find_unused_parameters``.

These ≤50M-param convnets have no attention/MoE/sequence axis, so PP/EP
are structurally N/A (SURVEY.md §5); DP over the batch is the parity axis.
Beyond parity, three more TPU-native sharding modes compose with DP:

* **FSDP** (``state_shardings(..., fsdp=True)``): parameters + optimizer
  state + gradients sharded over the ``data`` axis at rest (ZeRO-3 layout).
  GSPMD inserts the per-layer ``all_gather`` before use and turns the
  gradient ``psum`` into a ``reduce_scatter`` — same math, 1/N the per-chip
  state memory.
* **Spatial partitioning** (``make_mesh(spatial=k)``): activations sharded
  along image height on a ``space`` mesh axis — the conv analog of
  sequence parallelism. GSPMD emits halo exchanges (``ppermute``) for the
  conv windows. This is how a single *sample* larger than one chip's HBM
  (big input_size) trains across chips.
* **Tensor parallelism** (``make_mesh(tensor=k)`` +
  ``state_shardings(..., tensor=True)``): conv kernels sharded on their
  output-channel dim over a ``model`` mesh axis (the conv analog of
  Megatron column-parallel), so activations flow channel-sharded layer to
  layer and each chip trains a channel slice of the whole net. GSPMD
  inserts the boundary collectives (all-gather where a consumer needs full
  channels: the heads, the v2 passthrough concat). Unlike FSDP this also
  divides the *compute* per chip, not just the state bytes — the knob for
  models whose per-layer FLOPs outgrow one chip.

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
MODEL_AXIS = "model"


def make_mesh(devices=None, spatial: int = 1, tensor: int = 1) -> Mesh:
    """Device mesh: ``(data[, space][, model])``.

    ``spatial`` chips cooperate on each image's height dimension (spatial
    partitioning); ``tensor`` chips cooperate on each layer's channel
    dimension (tensor parallelism); the remaining factor is the
    data-parallel axis. Axes with size 1 are omitted.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    groups = max(spatial, 1) * max(tensor, 1)
    if devices.size % groups != 0:
        raise ValueError(
            f"{devices.size} devices not divisible by "
            f"spatial={spatial} x tensor={tensor}")
    shape, names = [devices.size // groups], [DATA_AXIS]
    if spatial > 1:
        shape.append(spatial)
        names.append(SPACE_AXIS)
    if tensor > 1:
        shape.append(tensor)
        names.append(MODEL_AXIS)
    return Mesh(devices.reshape(shape), tuple(names))


def spatial_size(mesh: Mesh) -> int:
    return mesh.shape.get(SPACE_AXIS, 1)


def tensor_size(mesh: Mesh) -> int:
    return mesh.shape.get(MODEL_AXIS, 1)


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


def _leaf_spec(shape: tuple, n_data: int, n_model: int, fsdp: bool,
               tensor: bool, min_elems: int) -> P:
    """Combined TP + FSDP partition spec for one state leaf.

    TP: rank>=2 kernels shard their last (output-channel) dim over
    ``model`` when divisible — HWIO conv kernels split on C_out, dense
    kernels on out-features; BN scales/stats and odd-channel heads stay
    replicated (GSPMD gathers at those boundaries). FSDP then shards the
    largest remaining ``data``-divisible dim. Leaves smaller than
    ``min_elems`` stay replicated — gathering BN scales and 1x1-conv tails
    costs more latency than their bytes are worth.
    """
    if not shape or int(np.prod(shape)) < min_elems:
        return P()
    spec = [None] * len(shape)
    if tensor and len(shape) >= 2 and shape[-1] % n_model == 0:
        spec[-1] = MODEL_AXIS
    if fsdp:
        for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
            if spec[i] is None and shape[i] >= n_data \
                    and shape[i] % n_data == 0:
                spec[i] = DATA_AXIS
                break
    return P(*spec)


def state_shardings(mesh: Mesh, state, fsdp: bool = False,
                    tensor: bool = False, min_shard_elems: int = 2 ** 14):
    """Per-leaf sharding pytree for a TrainState (or any pytree).

    Default: everything replicated (pure DP — reference parity).
    ``fsdp=True``: ZeRO-3 layout — every large param/momentum/batch-stat
    leaf sharded over the ``data`` axis (its largest divisible dim).
    ``tensor=True`` (mesh must have a ``model`` axis): kernels sharded on
    output channels over ``model``; composes with FSDP, which then takes a
    *different* dim of the same leaf. Pass the result to ``jax.device_put``
    and to the steps' ``state_shardings=`` so params, optimizer state, and
    gradients live sharded at rest.
    """
    n_data = mesh.shape[DATA_AXIS]
    n_model = tensor_size(mesh)
    tensor = tensor and n_model > 1
    repl = NamedSharding(mesh, P())

    def leaf(x):
        if not (fsdp or tensor):
            return repl
        shape = tuple(getattr(x, "shape", ()) or ())
        return NamedSharding(mesh, _leaf_spec(
            shape, n_data, n_model, fsdp, tensor, min_shard_elems))

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


def stacked_sharding(sharding: NamedSharding) -> NamedSharding:
    """The [K, ...]-stacked variant of a per-batch sharding: the leading
    scan axis (steps-per-dispatch) is unsharded, everything shifts right."""
    return NamedSharding(sharding.mesh, P(None, *sharding.spec))


def shard_stacked_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a [K, B, ...]-stacked batch group (cfg ``steps_per_dispatch``)
    onto the mesh — per-batch shardings shifted past the leading K axis."""
    shardings = {k: stacked_sharding(image_sharding(mesh)) if k == "img"
                 else stacked_sharding(batch_sharding(mesh))
                 for k in batch}
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(
                shardings[k], np.asarray(v))
            for k, v in batch.items()
        }
    return {k: jax.device_put(v, shardings[k]) for k, v in batch.items()}
