"""Benchmark: YOLOv3-darknet19 @416 training throughput (images/sec/chip).

Runs the full jitted training step (forward + vectorized target encoding +
CIoU loss + backward + SGD update, bf16 compute) on the attached TPU chip
with device-resident synthetic batches, so the number is the compute-path
ceiling the input pipeline must feed.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers
(BASELINE.json.published == {}). We use REF_GPU_IPS = 130 images/sec as the
estimated reference training throughput on its single unspecified GPU — a
YOLOv3-darknet19@416 torch fwd+bwd at batch 64 is ~150-200 img/s on a
2080Ti-class card, and the reference's per-step CPU Python target-encoding
loop (SURVEY.md §3.1) drags it below that. vs_baseline = value / REF_GPU_IPS.

The baseline is an ESTIMATE (no GPU in this environment to measure the
reference), so vs_baseline carries roughly a 0.5-2x band; the absolute
images/sec/chip and the roofline position (RESULTS.md "Round-2 MFU attack":
495 GB/s effective of 819 peak, bandwidth-bound, pure-BW floor ~1540 img/s)
are the hard numbers. Run-to-run variance over the axon tunnel is ~±3%.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

REF_GPU_IPS = 130.0
BATCH = 128
WARMUP = 3
ITERS = 10


def main():
    from __graft_entry__ import _flagship_cfg
    from podtpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
    from podtpu.train.state import create_train_state
    from podtpu.train.steps import make_train_step

    cfg = _flagship_cfg(input_size=416, compute_dtype="bfloat16")
    mesh = make_mesh()
    n_chips = len(jax.devices())

    rng = jax.random.PRNGKey(0)
    state = create_train_state(cfg, rng)
    state = jax.device_put(state, replicated_sharding(mesh))

    r = np.random.default_rng(0)
    imgs = r.uniform(0, 1, (BATCH, 416, 416, 3)).astype(np.float32)
    annot = -np.ones((BATCH, cfg["max_annots"], 5), np.float32)
    for b in range(BATCH):
        for i in range(8):
            cx, cy = r.uniform(0.1, 0.9, 2)
            w, h = r.uniform(0.05, 0.4, 2)
            annot[b, i] = [cx, cy, w, h, r.integers(0, 20)]
    batch = shard_batch({"img": imgs, "annot": annot}, mesh)

    train_step = make_train_step(cfg, mesh, donate=True)

    for _ in range(WARMUP):
        state, metrics = train_step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = train_step(state, batch, rng)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt / n_chips
    print(json.dumps({
        "metric": "yolov3_416_train_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / REF_GPU_IPS, 3),
    }))


if __name__ == "__main__":
    main()
