"""VOC-scale rehearsal on synthetic data (VERDICT r1 item 3).

Generates a VOC-shaped synthetic set (default 14,041 train / 2,510 val —
the reference's split sizes, README.md:43-46 — 20 classes @416) and runs the
yolov2 / yolov3 recipes with the schedule compressed 10x (burn-in 1000 steps
kept REAL, the 40k-step 0.1 decay moved to 4k) so one run exercises the full
cadence: burn-in ramp -> plateau -> decay -> val-every-5 + early-stop
bookkeeping, at real VOC scale for the input pipeline and checkpoint paths.

    python tools/voc_rehearsal.py --data /data/voc_rehearsal --model yolov2 \
        [--epochs 30] [--n-train 14041 --n-val 2510]
"""

from __future__ import annotations

import argparse
import os
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def ensure_data(data_dir: str, n_train: int, n_val: int, size: int) -> dict:
    marker = os.path.join(data_dir, "train.txt")
    if os.path.exists(marker):
        return {"train_list": marker,
                "val_list": os.path.join(data_dir, "val.txt"),
                "names": os.path.join(data_dir, "synth.names")}
    from podtpu.data.synthetic import generate

    print(f"generating {n_train}+{n_val} synthetic images @{size} ...")
    return generate(data_dir, n_train=n_train, n_val=n_val, size=size,
                    num_classes=20, seed=0)


def rehearsal_cfg(model: str, info: dict, epochs: int, save_dir: str) -> dict:
    cfg = yaml.safe_load(open(os.path.join(REPO, f"configs/{model}_voc.yaml")))
    cfg.update(
        train_list=info["train_list"], val_list=info["val_list"],
        names=info["names"], save_dir=save_dir, epochs=epochs,
        dataset_name="voc-rehearsal",
        # fast-host combo proven in RESULTS.md; geometry on host, photometric
        # fused on device
        cache_images=True, uint8_batches=True, device_augment=True,
    )
    sched = dict(cfg.get("scheduler_options", {}))
    if cfg.get("scheduler") == "yolo_lr":
        # compress the 40k-step decay so it fires inside the rehearsal
        # (burn-in stays the real 1000 steps)
        sched["steps"] = [int(cfg.get("rehearsal_decay_step", 2000))]
        cfg["scheduler_options"] = sched
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=str, default="/tmp/voc_rehearsal_data")
    ap.add_argument("--model", type=str, default="yolov2",
                    choices=["yolov2", "yolov3"])
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--decay-step", type=int, default=2000,
                    help="compressed yolo_lr decay step (real recipe: 40000)")
    ap.add_argument("--n-train", type=int, default=14041)
    ap.add_argument("--n-val", type=int, default=2510)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--save-dir", type=str, default="./saved")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--resume", type=str, default=None,
                    help="checkpoint dir, or 'auto' to pick the latest "
                         "run's checkpoints/last under save-dir")
    args = ap.parse_args()

    from podtpu.config import setup_platform

    setup_platform(args.platform)
    info = ensure_data(args.data, args.n_train, args.n_val, args.size)
    cfg = rehearsal_cfg(args.model, dict(info,), args.epochs, args.save_dir)
    cfg["rehearsal_decay_step"] = args.decay_step
    if cfg.get("scheduler") == "yolo_lr":
        cfg["scheduler_options"]["steps"] = [args.decay_step]
    cfg_path = os.path.join(args.data, f"{args.model}_rehearsal.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    print(f"rehearsal config -> {cfg_path}")

    resume = args.resume
    if resume == "auto":
        import glob

        runs = sorted(glob.glob(os.path.join(
            args.save_dir, f"{args.model}_voc-rehearsal", "version_*")),
            key=lambda p: int(p.rsplit("_", 1)[1]))
        resume = (os.path.join(runs[-1], "checkpoints", "last")
                  if runs else None)
        print(f"auto-resume from: {resume}")

    from train import train

    trainer = train(cfg, resume=resume)
    last = trainer.history[-1] if trainer.history else {}
    print("rehearsal done:", last)


if __name__ == "__main__":
    main()
