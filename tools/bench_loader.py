"""Host input-pipeline throughput benchmark (VERDICT r1 item 8).

Measures Loader img/s across worker counts and executor modes on synthetic
data, for both pipelines — replacing the round-1 linear extrapolation from
single-core per-sample times with measured end-to-end loader numbers.

    python tools/bench_loader.py [--size 416] [--n 160] [--batch 32] \
        [--modes thread:1,thread:4,thread:8,process:2,process:4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from podtpu.data.dataset import YoloTxtDataset  # noqa: E402
from podtpu.data.loader import Loader  # noqa: E402
from podtpu.data.synthetic import generate  # noqa: E402


def bench(ds, batch: int, workers: int, mode: str, n_images: int) -> float:
    loader = Loader(ds, batch_size=batch, shuffle=True, max_annots=16,
                    workers=workers, worker_mode=mode, seed=0)
    loader.set_epoch(0)
    # Loader builds a fresh executor per iterator, so a throwaway warm
    # iterator would NOT warm the pool the timed run uses. Instead consume
    # the first batch of the timed iterator untimed: it absorbs pool
    # spin-up (seconds for spawn-mode process workers) and page-cache cold
    # reads, then the clock starts.
    seen = 0
    it = iter(loader)
    try:
        next(it)
        t0 = time.perf_counter()
        for b in it:
            seen += b["img"].shape[0]
            if seen >= n_images:
                break
    finally:
        it.close()
    return seen / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--n", type=int, default=160, help="images per timing")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n-train", type=int, default=256)
    ap.add_argument("--modes", type=str,
                    default="thread:1,thread:2,thread:4,thread:8,"
                            "process:1,process:2,process:4")
    ap.add_argument("--pipeline", type=str, default="letterbox",
                    choices=["letterbox", "simple"])
    ap.add_argument("--uint8", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="--no-uint8 benches the float32 batch path")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as tmp:
        info = generate(tmp, n_train=args.n_train, n_val=8, size=args.size,
                        num_classes=20, seed=0)
        ds = YoloTxtDataset(info["train_list"], args.size, augment=True,
                            pipeline=args.pipeline, output_uint8=args.uint8)
        results = {}
        for spec in args.modes.split(","):
            mode, w = spec.split(":")
            ips = bench(ds, args.batch, int(w), mode, args.n)
            results[spec] = round(ips, 2)
            print(f"{spec:>12}: {ips:8.1f} img/s")
        print(json.dumps({"pipeline": args.pipeline, "size": args.size,
                          "ncpu": os.cpu_count(), "img_per_sec": results}))


if __name__ == "__main__":
    main()
