"""A/B the async-checkpoint overlap (cfg ``async_checkpoint``) on real runs.

Interleaved short fits on the synthetic dataset (save_freq 1, so every
epoch pays last+periodic saves), sync/async/sync/async; each run prints its
total fit wall time and mean s/epoch INCLUDING the compile epoch. All runs
share one process, so the in-process jit cache makes every run after the
first compile-free — compare runs within the SECOND (warm) pair, not the
first. The checkpoint cost being hidden is the host-side orbax commit
(serialize + fsync of the run directory) — the device->host copy stays
synchronous either way (donation safety).

Usage: python tools/bench_async_ckpt.py [--platform cpu] [--epochs 6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(async_save: bool, info: dict, epochs: int, tmp: str) -> float:
    from podtpu.data import Loader
    from podtpu.data.dataset import YoloTxtDataset
    from podtpu.train.trainer import Trainer

    cfg = {
        "model": "yolov4-tiny", "dataset_name": "asyncab", "num_classes": 4,
        "input_size": 256, "in_channels": 3, "compute_dtype": "bfloat16",
        "anchors": [[8, 8], [12, 16], [16, 12], [20, 24], [28, 22],
                    [32, 36], [44, 40], [56, 60], [72, 68]],
        "epochs": epochs, "batch_size": 16, "workers": 4, "max_annots": 8,
        "save_dir": os.path.join(tmp, "async" if async_save else "sync"),
        "save_freq": 1, "async_checkpoint": async_save,
        "trainer_options": {"check_val_every_n_epoch": 10_000},
        "optimizer": "sgd", "optimizer_options": {"lr": 1e-3},
        "scheduler": "yolo_lr",
        "scheduler_options": {"burn_in": 50, "steps": [10_000],
                              "scales": [0.1]},
        "top_k_candidates": 64, "max_detections": 10,
        "train_list": info["train_list"], "val_list": info["val_list"],
        "names": info["names"], "seed": 0,
    }
    train_ds = YoloTxtDataset(cfg["train_list"], 256, True, "simple")
    val_ds = YoloTxtDataset(cfg["val_list"], 256, False, "simple")
    train = Loader(train_ds, batch_size=16, shuffle=True, max_annots=8,
                   workers=4, seed=0)
    val = Loader(val_ds, batch_size=16, shuffle=False, max_annots=8,
                 workers=4, seed=0)
    trainer = Trainer(cfg, log=lambda *_: None)
    t0 = time.time()
    trainer.fit(train, val, epochs=epochs)
    return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--out", default="/tmp/async_ab")
    args = ap.parse_args()
    from podtpu.config import setup_platform

    setup_platform(args.platform)
    from podtpu.data.synthetic import generate

    os.makedirs(args.out, exist_ok=True)
    info = generate(os.path.join(args.out, "data"), n_train=192, n_val=16,
                    size=256, num_classes=4, seed=0)
    for mode in (False, True, False, True):
        total = run(mode, info, args.epochs, args.out)
        per_epoch = total / args.epochs
        print(f"async={mode}: fit {total:.1f}s total, "
              f"{per_epoch:.2f}s/epoch (incl. compile in epoch 0)")


if __name__ == "__main__":
    main()
