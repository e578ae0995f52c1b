"""E2E A/B of cfg ``device_geom`` on real training runs (host-bound box).

Interleaved short fits on the synthetic dataset with the device combo
(uint8_batches + cache_images + device_augment), with and without
device_geom, twice: off/on/off/on. Compare within the SECOND (warm) pair —
all runs share one process so the jit cache makes them compile-free, and
the image cache persists per run only (epoch 0 of each run pays the fill).
Reports mean steady-state images/sec over the post-cache epochs.

Usage: python tools/bench_device_geom.py [--platform cpu] [--epochs 6]
       [--pipeline simple|letterbox] [--size 256] [--n 512] [--batch 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(device_geom: bool, info: dict, args, tmp: str) -> list[float]:
    from podtpu.data import Loader, build_datasets
    from podtpu.train.trainer import Trainer

    cfg = {
        "model": "yolov4-tiny", "dataset_name": "geomab",
        "input_size": args.size, "in_channels": 3,
        "num_classes": info["num_classes"],
        "anchors": [[10, 14], [23, 27], [37, 58], [81, 82], [135, 169],
                    [344, 319], [60, 60], [100, 100], [160, 160]],
        "conf_threshold": 0.25, "batch_size": args.batch, "max_annots": 32,
        "train_list": info["train_list"], "val_list": info["val_list"],
        "names": info["names"], "workers": 4,
        "save_dir": os.path.join(tmp, f"save_{device_geom}"),
        "save_freq": 100, "epochs": args.epochs,
        "compute_dtype": "bfloat16", "pipeline": args.pipeline,
        "uint8_batches": True, "cache_images": True,
        "device_augment": True, "device_geom": device_geom,
        "optimizer": "sgd", "optimizer_options": {"lr": 1e-3, "momentum": 0.9},
        "scheduler": "multi_step",
        "scheduler_options": {"milestones": [100000], "gamma": 0.1},
        "trainer_options": {"check_val_every_n_epoch": 1000},
        "progress": False,
    }
    train_ds, val_ds = build_datasets(cfg)
    train = Loader(train_ds, batch_size=args.batch, shuffle=True,
                   max_annots=32, workers=4)
    val = Loader(val_ds, batch_size=args.batch, shuffle=False, max_annots=32)
    trainer = Trainer(cfg, log=lambda *_: None)
    trainer.fit(train, val, epochs=args.epochs)
    return [row["images_per_sec"] for row in trainer.history]


def main():
    from podtpu.config import setup_platform
    from podtpu.data.synthetic import generate

    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--pipeline", default="simple",
                    choices=("simple", "letterbox"))
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    setup_platform(args.platform)

    tmp = tempfile.mkdtemp(prefix="geomab_")
    info = generate(os.path.join(tmp, "data"), n_train=args.n, n_val=32,
                    size=max(args.size, 320), num_classes=4, seed=0)
    for rep in range(2):
        for geom in (False, True):
            ips = run(geom, info, args, os.path.join(tmp, f"r{rep}"))
            steady = ips[1:] or ips  # epoch 0 pays cache fill (+ compile)
            print(f"rep{rep} device_geom={geom}: per-epoch {['%.1f' % x for x in ips]} "
                  f"-> steady {sum(steady) / len(steady):.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
