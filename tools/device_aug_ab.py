"""A/B the accuracy cost of device_augment over a full synthetic run.

device_augment moves photometric augmentation (HSV/flip/jitter) onto the TPU
with an RGB-space HSV approximation (data/device_aug.py) — the recommended
fast-host path. Round 1 only spot-checked its trajectory to epoch 14; this
runs the same recipe to completion twice (host photometric vs device) and
prints both val_mAP curves (VERDICT r1 item 8). Mode "geom" adds
device_geom on top (the simple pipeline's resize-then-crop
approximation) for ITS accuracy A/B against the "device" curve.

    python tools/device_aug_ab.py --data /tmp/synth_ab --epochs 30 \
        --mode host|device      # one mode per invocation (resumable slices)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=str, default="/tmp/synth_ab")
    ap.add_argument("--mode", type=str, required=True,
                    choices=["host", "device", "geom"])
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--save-dir", type=str, default="./saved")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--resume", type=str, default=None)
    args = ap.parse_args()

    from podtpu.config import setup_platform

    setup_platform(args.platform)

    if not os.path.exists(os.path.join(args.data, "train.txt")):
        from podtpu.data.synthetic import generate

        generate(args.data, n_train=2000, n_val=400, size=256,
                 num_classes=4, seed=3)

    cfg = yaml.safe_load(open(os.path.join(REPO,
                                           "configs/yolov4-tiny_synth.yaml")))
    cfg.update(
        train_list=f"{args.data}/train.txt", val_list=f"{args.data}/val.txt",
        names=f"{args.data}/synth.names", epochs=args.epochs,
        save_dir=args.save_dir, cache_images=True, uint8_batches=True,
        device_augment=(args.mode in ("device", "geom")),
        device_geom=(args.mode == "geom"),
        dataset_name=f"ab-{args.mode}",
        compute_dtype="bfloat16",
    )

    resume = args.resume
    if resume == "auto":
        import glob

        runs = sorted(glob.glob(os.path.join(
            args.save_dir, f"yolov4-tiny_ab-{args.mode}", "version_*")),
            key=lambda p: int(p.rsplit("_", 1)[1]))
        resume = (os.path.join(runs[-1], "checkpoints", "last")
                  if runs else None)
        print(f"auto-resume from: {resume}")

    from train import train

    trainer = train(cfg, resume=resume)
    rows = [{k: r.get(k) for k in ("epoch", "train_loss", "val_mAP")}
            for r in trainer.history]
    print("AB", args.mode, json.dumps(rows))


if __name__ == "__main__":
    main()
