"""Worker for the two-process tests (launched by tests/test_multihost.py).

Each process: joins a jax.distributed CPU cluster (2 processes x N virtual
devices), dumps its loader shard indices, runs ONE global train step on a
deterministic global batch (each process feeding only its local rows), and
writes loss + a parameter checksum. The parent asserts the shards are
disjoint/exhaustive and the step matches a single-process run on the same
global batch (SURVEY.md §2.7 per-host sharded input requirement).

Mode ``dp`` (default, 2x2 devices) is reference DDP parity; modes
``dp_fsdp`` / ``dp_tp`` / ``dp_sp`` (2x4 devices) run the composed meshes
with PROCESS-SPANNING sharded state — parameters/optimizer leaves living
partly on each host (ZeRO-3 / Megatron-conv / spatial layouts from
podtpu/parallel/mesh.py).

Usage: python multihost_worker.py <pid> <port> <out_json> <train_list> \
           [mode] [local_devices]
"""

import json
import os
import sys

_MODE = sys.argv[5] if len(sys.argv) > 5 else "dp"
_LOCAL = int(sys.argv[6]) if len(sys.argv) > 6 else 2
# process-count of the spawned cluster (test_four_process_fsdp raises it
# to 4; the global batch of 8 rows is split evenly across processes)
_NPROCS = int(os.environ.get("MH_NPROCS", "2"))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={_LOCAL}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    pid, port, out_path, train_list = (
        int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4])
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=_NPROCS,
                               process_id=pid)
    assert jax.process_count() == _NPROCS
    assert len(jax.devices()) == _NPROCS * _LOCAL
    if _MODE.startswith("elastic_"):
        run_elastic(pid, out_path, train_list, _MODE.split("_", 1)[1],
                    sys.argv[7])
        return
    if _MODE != "dp":
        run_composed(pid, out_path, train_list)
        return

    import jax.numpy as jnp
    import numpy as np

    from podtpu.data.dataset import YoloTxtDataset
    from podtpu.data.loader import Loader, pad_annotations
    from podtpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
    from podtpu.train.state import create_train_state
    from podtpu.train.steps import make_train_step
    from tests.multihost_common import CFG, make_global_batch

    ds = YoloTxtDataset(train_list, CFG["input_size"], augment=False,
                        pipeline="simple")
    loader = Loader(ds, batch_size=3, shuffle=True, max_annots=8, workers=1,
                    seed=7, host_id=jax.process_index(),
                    host_count=jax.process_count())
    loader.set_epoch(0)
    my_indices = [int(i) for i in loader._indices()]

    imgs, annots = make_global_batch(ds, pad_annotations)
    rows = len(imgs) // _NPROCS  # each process feeds its slice of the
    local = {"img": imgs[pid * rows:(pid + 1) * rows],  # 8-row global batch
             "annot": annots[pid * rows:(pid + 1) * rows]}

    mesh = make_mesh()
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    state = jax.device_put(state, replicated_sharding(mesh))
    step = make_train_step(CFG, mesh, donate=False)
    new_state, metrics = step(state, shard_batch(local, mesh),
                              jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    psum = float(sum(float(jnp.sum(x))
                     for x in jax.tree_util.tree_leaves(new_state.params)))

    # --- global-mAP validation: every host must score the GLOBAL val set
    # (Trainer.validate all-gathers each host's detection/annotation rows)
    from podtpu.train.trainer import Trainer

    trainer = Trainer(CFG, eval_only=True, log=lambda *_: None)
    vloader = Loader(ds, batch_size=CFG["batch_size"] // 2, shuffle=False,
                     max_annots=8, workers=1, host_id=pid, host_count=2)
    val = trainer.validate(vloader)

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "indices": my_indices, "loss": loss,
                   "param_sum": psum,
                   "val_map": val["val_mAP"], "val_loss": val["val_loss"],
                   "n_scored": int(trainer.map_metric.img_idx),
                   "n_devices": len(jax.devices()),
                   "n_local": len(jax.local_devices())}, f)


def run_composed(pid: int, out_path: str, train_list: str):
    """One global train step on a composed 8-device mesh spanning the two
    processes, with state sharded at rest (fsdp / tensor / spatial)."""
    import jax.numpy as jnp

    from podtpu.data.dataset import YoloTxtDataset
    from podtpu.data.loader import pad_annotations
    from podtpu.parallel.mesh import make_mesh, shard_batch, state_shardings
    from podtpu.train.state import create_train_state
    from podtpu.train.steps import make_train_step
    from tests.multihost_common import CFG, make_global_batch

    spatial = 2 if _MODE == "dp_sp" else 1
    tensor = 2 if _MODE == "dp_tp" else 1
    fsdp = _MODE == "dp_fsdp"
    mesh = make_mesh(spatial=spatial, tensor=tensor)

    state = create_train_state(CFG, jax.random.PRNGKey(0))
    shardings = state_shardings(mesh, state, fsdp=fsdp, tensor=tensor > 1,
                                min_shard_elems=2 ** 10)
    state = jax.device_put(state, shardings)
    n_sharded = sum(
        1 for s in jax.tree_util.tree_leaves(
            shardings, is_leaf=lambda x: hasattr(x, "spec"))
        if tuple(s.spec))

    ds = YoloTxtDataset(train_list, CFG["input_size"], augment=False,
                        pipeline="simple")
    imgs, annots = make_global_batch(ds, pad_annotations)
    rows = len(imgs) // _NPROCS  # each process feeds its slice of the
    local = {"img": imgs[pid * rows:(pid + 1) * rows],  # 8-row global batch
             "annot": annots[pid * rows:(pid + 1) * rows]}

    step = make_train_step(CFG, mesh, donate=False,
                           state_shardings=shardings)
    new_state, metrics = step(state, shard_batch(local, mesh),
                              jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    # cross-process-sharded leaves aren't eagerly reducible on one host;
    # the checksum must be a global jitted computation with a replicated
    # (hence fully-addressable) output
    from jax.sharding import NamedSharding, PartitionSpec

    psum_fn = jax.jit(
        lambda p: sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(p)),
        out_shardings=NamedSharding(mesh, PartitionSpec()))
    psum = float(psum_fn(new_state.params))

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "mode": _MODE, "loss": loss,
                   "param_sum": psum, "n_sharded": n_sharded,
                   "mesh": dict(mesh.shape),
                   "n_devices": len(jax.devices()),
                   "n_local": len(jax.local_devices())}, f)


def run_elastic(pid: int, out_path: str, train_list: str, action: str,
                ckpt_dir: str):
    """Elastic-topology leg on the 2-process side: an 8-device FSDP mesh
    spanning both processes either trains 2 steps and SAVES a checkpoint
    (``action='save'``), or RESTORES one written by a different topology
    and continues 2 steps (``action='resume'``) — the pod preemption-
    recovery scenario where the job comes back at a different process
    count (VERDICT r3 item 5)."""
    import jax.numpy as jnp

    from podtpu.data.dataset import YoloTxtDataset
    from podtpu.data.loader import pad_annotations
    from podtpu.parallel.mesh import make_mesh, shard_batch, state_shardings
    from podtpu.train.state import create_train_state
    from podtpu.train.steps import make_train_step
    from podtpu.train.trainer import CheckpointIO
    from tests.multihost_common import CFG, make_global_batch

    mesh = make_mesh()
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    shardings = state_shardings(mesh, state, fsdp=True,
                                min_shard_elems=2 ** 10)
    state = jax.device_put(state, shardings)
    io = CheckpointIO(ckpt_dir)
    if action == "resume":
        state = io.restore(os.path.join(ckpt_dir, "elastic"), state)

    ds = YoloTxtDataset(train_list, CFG["input_size"], augment=False,
                        pipeline="simple")
    imgs, annots = make_global_batch(ds, pad_annotations)
    rows = len(imgs) // _NPROCS  # each process feeds its slice of the
    local = {"img": imgs[pid * rows:(pid + 1) * rows],  # 8-row global batch
             "annot": annots[pid * rows:(pid + 1) * rows]}
    dbatch = shard_batch(local, mesh)

    step = make_train_step(CFG, mesh, donate=False,
                           state_shardings=shardings)
    losses = []
    for _ in range(2):
        state, metrics = step(state, dbatch, jax.random.PRNGKey(1))
        losses.append(float(metrics["loss"]))

    if action == "save":
        # "elastic" is a non-staged target: both processes participate in
        # the one orbax multiprocess commit (the staging rename-swap of the
        # named targets is a single-host move)
        io.save("elastic", state)
        io.wait()

    from jax.sharding import NamedSharding, PartitionSpec

    psum_fn = jax.jit(
        lambda p: sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(p)),
        out_shardings=NamedSharding(mesh, PartitionSpec()))
    psum = float(psum_fn(state.params))

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "mode": _MODE, "losses": losses,
                   "param_sum": psum, "step": int(state.step),
                   "n_devices": len(jax.devices()),
                   "n_local": len(jax.local_devices())}, f)


if __name__ == "__main__":
    main()
