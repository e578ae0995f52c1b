"""Train-step throughput probe for any model family on the attached chip.

    python tools/bench_family.py --cfg configs/yolov4_voc.yaml --batches 16,32,48

Same methodology as bench.py (full jitted train step, device-resident
synthetic batches, donated state chaining across iterations so the axon
terminal's dispatch memoization cannot short-circuit the timing).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(cfg: dict, batch: int, warmup: int = 3, iters: int = 10) -> float:
    from podtpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
    from podtpu.train.state import create_train_state
    from podtpu.train.steps import make_train_step

    mesh = make_mesh()
    n_chips = len(jax.devices())
    rng = jax.random.PRNGKey(0)
    state = create_train_state(cfg, rng)
    state = jax.device_put(state, replicated_sharding(mesh))

    size = cfg["input_size"]
    r = np.random.default_rng(0)
    imgs = r.uniform(0, 1, (batch, size, size, 3)).astype(np.float32)
    annot = -np.ones((batch, cfg["max_annots"], 5), np.float32)
    for b in range(batch):
        for i in range(min(8, cfg["max_annots"])):
            cx, cy = r.uniform(0.1, 0.9, 2)
            w, h = r.uniform(0.05, 0.4, 2)
            annot[b, i] = [cx, cy, w, h, r.integers(0, cfg["num_classes"])]
    dbatch = shard_batch({"img": imgs, "annot": annot}, mesh)

    train_step = make_train_step(cfg, mesh, donate=True)

    def fence(m):
        # real device round trip on ONE scalar: block_until_ready has been
        # observed returning early over the axon tunnel (CLAUDE.md); the
        # scalar exists only after the final chained step finished
        jax.block_until_ready(m["loss"])
        jax.device_get(m["loss"])

    for _ in range(warmup):
        state, metrics = train_step(state, dbatch, rng)
    fence(metrics)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, dbatch, rng)
    fence(metrics)
    dt = time.perf_counter() - t0
    return batch * iters / dt / n_chips


def main():
    from podtpu.config import get_configs, setup_platform

    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--batches", default="32")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    setup_platform(args.platform)

    cfg = get_configs(args.cfg)
    for b in [int(x) for x in args.batches.split(",")]:
        ips = bench(cfg, b, iters=args.iters)
        print(json.dumps({
            "model": cfg["model"], "input_size": cfg["input_size"],
            "batch": b, "images_per_sec_per_chip": round(ips, 2),
        }))


if __name__ == "__main__":
    main()
