"""TTA + EMA accuracy A/B on a trained synthetic soak.

Trains ONE 30-epoch yolov4-tiny soak (the standard 2000/400 synthetic
@256 bf16 recipe used for every accuracy A/B in RESULTS.md) with cfg
``ema: true``, then evaluates the SAME saved checkpoint under each
test-time-augmentation variant — off / hflip / scales / hflip+scales —
with both EMA and raw weights at the baseline. Every eval is one fresh
compiled program (TTA branches live inside the eval step); mAP deltas are
therefore pure post-processing effects on identical weights.

    python tools/tta_ab.py --phase train [--epochs 30] [--resume auto]
    python tools/tta_ab.py --phase eval [--ckpt auto]

Run on the TPU only, never concurrently with bench.py (CLAUDE.md). The
train phase is resumable (``--resume auto`` picks up the newest run's
``last``); the eval phase re-runs in minutes if interrupted.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATASET = "tta-ab"

VARIANTS = [
    ("off", None),
    ("hflip", {"hflip": True}),
    ("scales", {"hflip": False, "scales": [0.83, 0.67]}),
    ("hflip+scales", {"hflip": True, "scales": [0.83, 0.67]}),
]


def build_cfg(args) -> dict:
    if not os.path.exists(os.path.join(args.data, "train.txt")):
        from podtpu.data.synthetic import generate

        generate(args.data, n_train=args.n_train, n_val=args.n_val,
                 size=256, num_classes=4, seed=3)
    cfg = yaml.safe_load(
        open(os.path.join(REPO, "configs/yolov4-tiny_synth.yaml")))
    cfg.update(
        train_list=f"{args.data}/train.txt", val_list=f"{args.data}/val.txt",
        names=f"{args.data}/synth.names", epochs=args.epochs,
        save_dir=args.save_dir, cache_images=True, uint8_batches=True,
        device_augment=True, dataset_name=DATASET,
        compute_dtype="bfloat16", ema=True,
    )
    return cfg


def latest_run(save_dir: str) -> str | None:
    runs = sorted(
        glob.glob(os.path.join(save_dir, f"yolov4-tiny_{DATASET}",
                               "version_*")),
        key=lambda p: int(p.rsplit("_", 1)[1]))
    return runs[-1] if runs else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True, choices=["train", "eval"])
    ap.add_argument("--data", type=str, default="/tmp/synth_tta")
    ap.add_argument("--n-train", type=int, default=2000)
    ap.add_argument("--n-val", type=int, default=400)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--save-dir", type=str, default="./saved")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--resume", type=str, default=None)
    ap.add_argument("--ckpt", type=str, default="auto")
    args = ap.parse_args()

    from podtpu.config import setup_platform

    setup_platform(args.platform)
    cfg = build_cfg(args)

    if args.phase == "train":
        resume = args.resume
        if resume == "auto":
            run = latest_run(args.save_dir)
            resume = (os.path.join(run, "checkpoints", "last")
                      if run else None)
            print(f"auto-resume from: {resume}")
        from train import train

        trainer = train(cfg, resume=resume)
        rows = [{k: r.get(k) for k in ("epoch", "train_loss", "val_mAP")}
                for r in trainer.history]
        print("TTA-AB train", json.dumps(rows))
        return

    ckpt = args.ckpt
    if ckpt == "auto":
        run = latest_run(args.save_dir)
        if run is None:
            sys.exit("no trained tta-ab run found — run --phase train first")
        ckpt = os.path.join(run, "checkpoints", "last")
    print(f"evaluating: {ckpt}")

    from test import evaluate

    results = {}
    # EMA-vs-raw on the un-augmented eval first (the EMA accuracy A/B),
    # then every TTA variant on the EMA weights (the deployment choice).
    for name, tta, use_ema in (
        [("off/raw", None, False), ("off/ema", None, True)]
        + [(f"{n}/ema", t, True) for n, t in VARIANTS[1:]]
    ):
        c = dict(cfg)
        if tta is None:
            c.pop("tta", None)
        else:
            c["tta"] = tta
        r = evaluate(c, ckpt, use_ema=use_ema)
        results[name] = {"val_mAP": float(r["val_mAP"]),
                         "val_loss": float(r["val_loss"])}
        print(f"[{name}] val_mAP {r['val_mAP']:.5f}")
    print("TTA-AB eval", json.dumps(results))


if __name__ == "__main__":
    main()
