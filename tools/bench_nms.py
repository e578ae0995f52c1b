"""NMS backend A/B on the attached chip: dense fori_loop vs early-exit.

Times batched_class_aware_nms (and its select/suppress split) at the
flagship eval shape — batch 128 x 10647 candidates (yolov3@416), K=512 —
under two score distributions:

* trained-like: ~20 real detections/image above conf 0.25, rest below
  (the serving regime the early-exit trip count targets);
* untrained-like: uniform scores, top_k saturated (the worst case — the
  while_loop must not lose materially to the fori_loop here).

    python tools/bench_nms.py [--batch 128] [--n 10647] [--iters 30]

Timing rules for this environment (CLAUDE.md): fresh input each iteration
(the terminal memoizes identical dispatches) and a single-element
jax.device_get fence (block_until_ready returns early over the tunnel).
Run on the TPU only, never concurrently with bench.py.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def make_candidates(batch: int, n: int, trained: bool, seed: int):
    rng = np.random.default_rng(seed)
    boxes = np.zeros((batch, n, 6), np.float32)
    boxes[..., 0:2] = rng.uniform(0, 416, (batch, n, 2))
    boxes[..., 2:4] = rng.uniform(8, 120, (batch, n, 2))
    boxes[..., 5] = rng.integers(0, 20, (batch, n))
    if trained:
        boxes[..., 4] = rng.uniform(0, 0.2, (batch, n))  # below threshold
        for b in range(batch):
            hot = rng.choice(n, 20, replace=False)
            boxes[b, hot, 4] = rng.uniform(0.3, 1.0, 20)
    else:
        boxes[..., 4] = rng.uniform(0, 1.0, (batch, n))
    return boxes


def timeit(fn, x0, iters: int) -> float:
    import jax
    import jax.numpy as jnp

    # Perturb via a TRACED delta: `x.at[...].add(python_const)` would bake
    # each k into a fresh XLA program, and the first A/B cell then pays
    # `iters` tunnel compiles the later cells get from the process cache
    # (measured: 117-329 ms/iter of phantom cost on the first cell).
    pert = jax.jit(lambda x, d: x.at[..., 4].add(d))
    deltas = [jax.device_put(np.float32(k * 1e-7)) for k in range(iters)]

    out = fn(pert(x0, deltas[0]))
    jax.device_get(jnp.ravel(out[0])[0])  # compile + warm
    t0 = time.perf_counter()
    for k in range(iters):
        out = fn(pert(x0, deltas[k]))  # fresh input: defeat memoizer
    jax.device_get(jnp.ravel(out[0])[0])  # honest fence
    return 1000 * (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n", type=int, default=10647)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--top-k", type=int, default=512)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    from podtpu.config import setup_platform

    setup_platform(args.platform)

    import jax
    import jax.numpy as jnp

    from podtpu.ops.nms import batched_class_aware_nms

    results = {}
    for dist in ("trained", "untrained"):
        x = jax.device_put(jnp.asarray(
            make_candidates(args.batch, args.n, dist == "trained", 0)))
        for backend in ("xla", "xla_early"):
            fn = jax.jit(functools.partial(
                batched_class_aware_nms, conf_threshold=0.25,
                iou_threshold=0.45, top_k=args.top_k, max_detections=100,
                backend=backend))
            ms = timeit(fn, x, args.iters)
            results[f"{dist}/{backend}"] = round(ms, 3)
            print(f"{dist:10s} {backend:10s} {ms:8.3f} ms/batch")
    print(json.dumps({"batch": args.batch, "n": args.n,
                      "top_k": args.top_k, "ms_per_batch": results}))


if __name__ == "__main__":
    main()
