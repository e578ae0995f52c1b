"""Profile the flagship train step on the attached TPU and name the top HLOs.

Traces a few batch-128 train steps with jax.profiler, then parses the
.xplane.pb directly (jax.profiler.ProfileData) and aggregates device-op
durations by HLO name — the xprof "top self-time ops" view without needing
the tensorboard UI (VERDICT r1 item 2).

    python tools/profile_step.py [--batch 128] [--iters 5]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402


def make_inputs(cfg, batch):
    r = np.random.default_rng(0)
    imgs = r.uniform(0, 1, (batch, 416, 416, 3)).astype(np.float32)
    annot = -np.ones((batch, cfg["max_annots"], 5), np.float32)
    annot[:, :8, :4] = r.uniform(0.2, 0.6, (batch, 8, 4))
    annot[:, :8, 4] = r.integers(0, 20, (batch, 8))
    return {"img": imgs, "annot": annot}


def top_ops(trace_dir: str, k: int = 30):
    """Aggregate device-plane event self-times by op name."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return None, []
    data = jax.profiler.ProfileData.from_file(paths[0])
    totals: dict = collections.Counter()
    device_total = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        for line in plane.lines:
            # the "XLA Ops" line carries per-op SELF times; "Async XLA Ops"
            # carries overlapping in-flight windows of async copies (its
            # total can exceed wall several-fold) — summing it double-counts
            if "XLA Ops" not in line.name or "Async" in line.name:
                continue
            for ev in line.events:
                dur = ev.duration_ns
                totals[ev.name] += dur
                device_total += dur
    return device_total, totals.most_common(k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--trace-dir", type=str, default="/tmp/podtpu_trace")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg
    from podtpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
    from podtpu.train.state import create_train_state
    from podtpu.train.steps import make_train_step

    cfg = _flagship_cfg(input_size=416, compute_dtype="bfloat16")
    mesh = make_mesh()
    state = jax.device_put(create_train_state(cfg, jax.random.PRNGKey(0)),
                           replicated_sharding(mesh))
    step = make_train_step(cfg, mesh, donate=True)
    batch = shard_batch(make_inputs(cfg, args.batch), mesh)
    rng = jax.random.PRNGKey(0)

    for _ in range(3):
        state, m = step(state, batch, rng)
    jax.block_until_ready(m["loss"])

    import shutil

    shutil.rmtree(args.trace_dir, ignore_errors=True)  # no stale xplanes
    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            state, m = step(state, batch, rng)
        jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"step {dt * 1000:.1f} ms -> {args.batch / dt:.1f} img/s "
          f"(batch {args.batch}, traced)")

    device_total, tops = top_ops(args.trace_dir)
    if device_total is None:
        print("no xplane captured (remote backend may not support tracing)")
        return
    print(f"device op time total: {device_total / 1e6 / args.iters:.2f} "
          f"ms/step")
    print(f"{'% dev':>6}  {'ms/step':>8}  op")
    for name, ns in tops:
        print(f"{100 * ns / device_total:6.2f}  {ns / 1e6 / args.iters:8.3f}"
              f"  {name[:110]}")


if __name__ == "__main__":
    main()
