"""Micro-batched serving A/B: concurrent request throughput through
tools/serve.py's Engine with and without --max-batch coalescing.

Exports a symbolic-batch fwd+decode+NMS artifact for --cfg, pre-encodes
--requests DISTINCT jpegs (distinct bytes defeat the axon dispatch
memoizer), then hammers the Engine from --threads client threads twice:
batch-1 per request vs micro-batched (--max-batch, --window-ms). Prints a
one-line JSON with requests/sec for both and the speedup.

    python tools/bench_microbatch.py --cfg configs/yolov4-tiny_voc.yaml \
        [--requests 64] [--threads 16] [--max-batch 16] [--window-ms 5]

Run on the TPU only (never concurrently with bench.py). Timing fences are
inherent: Engine materializes each response's detections on host.
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def _hammer(engine, bodies, warm_bodies, threads: int) -> float:
    """Wall seconds to serve every body once from ``threads`` clients.

    Warmup uses bodies EXCLUDED from the timed set: the axon terminal
    memoizes identical dispatches, so re-timing a warmed body would return
    in ~30 us and skew the serial side of the A/B."""
    with cf.ThreadPoolExecutor(threads) as ex:
        list(ex.map(engine.predict, warm_bodies))  # warm/compile
        t0 = time.perf_counter()
        list(ex.map(engine.predict, bodies))
        return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--requests", type=int, default=64)
    ap.add_argument("--threads", type=int, default=16)
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--window-ms", type=float, default=5.0)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    from podtpu.config import get_configs, setup_platform

    setup_platform(args.platform)
    import cv2
    import jax
    import numpy as np

    from podtpu.export.stablehlo import export_serving
    from podtpu.models import build_model
    from serve import Engine

    cfg = get_configs(args.cfg)
    model = build_model(cfg)
    size = cfg["input_size"]
    variables = model.init(jax.random.PRNGKey(0),
                           jax.numpy.zeros((1, size, size, 3)), train=False)

    rng = np.random.default_rng(0)
    bodies = [cv2.imencode(".jpg", rng.integers(0, 255, (size, size, 3))
                           .astype(np.uint8))[1].tobytes()
              for _ in range(args.requests + 2)]
    warm_bodies, bodies = bodies[:2], bodies[2:]

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "dyn.stablehlo")
        export_serving(model, variables, cfg,
                       (None, size, size, cfg.get("in_channels", 3)), path)
        serial = Engine(path, size, "resize", [])
        dt_serial = _hammer(serial, bodies, warm_bodies, args.threads)
        batched = Engine(path, size, "resize", [],
                         max_batch=args.max_batch, window_ms=args.window_ms)
        dt_batched = _hammer(batched, bodies, warm_bodies, args.threads)

    out = {
        "model": cfg["model"], "input_size": size,
        "requests": args.requests, "threads": args.threads,
        "max_batch": args.max_batch,
        "serial_rps": round(args.requests / dt_serial, 2),
        "batched_rps": round(args.requests / dt_batched, 2),
        "speedup": round(dt_serial / dt_batched, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
