"""QAT vs float-trained int8 accuracy A/B on the FLAGSHIP yolov3 recipe.

VERDICT r3 item 4: the round-3 QAT table (RESULTS.md) ran on yolov4-tiny
only; the int8 serving claim is about yolov3. This repeats the same
protocol on yolov3's letterbox pipeline @256: two identical synthetic
soaks (240/60, 60 epochs — the round-3 scale), one with cfg ``qat: true``
(STE int8 fake-quant in every ConvBnAct train forward), then BOTH
checkpoints evaluated float and int8-PTQ (``test.py --quantize int8``
semantics) — a four-cell table.

    python tools/qat_ab.py --phase train --arm float   [--epochs 60]
    python tools/qat_ab.py --phase train --arm qat
    python tools/qat_ab.py --phase eval

Run on the TPU only, never concurrently with bench.py (CLAUDE.md). Train
phases are resumable (``--resume auto``). The QAT graph compiles ~5x
slower over the tunnel (one-time; cached by .jax_cache afterwards).
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

# synthetic-set anchors (the @256 synthetic boxes are 13-77 px; the VOC
# anchors are tuned for 416 natural images) — same nine the yolov4-tiny
# soaks use (configs/yolov4-tiny_synth.yaml)
SYNTH_ANCHORS = [[20, 20], [30, 40], [40, 30], [50, 50], [60, 80],
                 [80, 60], [90, 90], [110, 140], [140, 110]]


def build_cfg(args, arm: str) -> dict:
    if not os.path.exists(os.path.join(args.data, "train.txt")):
        from podtpu.data.synthetic import generate

        generate(args.data, n_train=args.n_train, n_val=args.n_val,
                 size=256, num_classes=4, seed=3)
    cfg = yaml.safe_load(open(os.path.join(REPO, "configs/yolov3_voc.yaml")))
    cfg.update(
        input_size=256, num_classes=4, anchors=SYNTH_ANCHORS,
        train_list=f"{args.data}/train.txt", val_list=f"{args.data}/val.txt",
        names=f"{args.data}/synth.names", epochs=args.epochs,
        save_dir=args.save_dir, cache_images=True, uint8_batches=True,
        batch_size=16, max_annots=8, workers=2,
        dataset_name=f"qatab-{arm}", compute_dtype="bfloat16",
        qat=(arm == "qat"),
        scheduler_options={"burn_in": 100, "steps": [2000], "scales": [0.1]},
        trainer_options={"check_val_every_n_epoch": 5},
    )
    return cfg


def latest_run(save_dir: str, arm: str) -> str | None:
    runs = sorted(
        glob.glob(os.path.join(save_dir, f"yolov3_qatab-{arm}",
                               "version_*")),
        key=lambda p: int(p.rsplit("_", 1)[1]))
    return runs[-1] if runs else None


def best_or_last(run: str) -> str:
    best = os.path.join(run, "checkpoints", "best")
    if os.path.isdir(best) or os.path.isdir(best + ".staging"):
        return best
    return os.path.join(run, "checkpoints", "last")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True, choices=["train", "eval"])
    ap.add_argument("--arm", choices=["float", "qat"], default=None)
    ap.add_argument("--data", type=str, default="/tmp/synth_qat")
    ap.add_argument("--n-train", type=int, default=240)
    ap.add_argument("--n-val", type=int, default=60)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--save-dir", type=str, default="./saved")
    ap.add_argument("--platform", type=str, default=None)
    ap.add_argument("--resume", type=str, default=None)
    args = ap.parse_args()

    from podtpu.config import setup_platform

    setup_platform(args.platform)

    if args.phase == "train":
        if args.arm is None:
            sys.exit("--phase train needs --arm float|qat")
        cfg = build_cfg(args, args.arm)
        resume = args.resume
        if resume == "auto":
            run = latest_run(args.save_dir, args.arm)
            resume = (os.path.join(run, "checkpoints", "last")
                      if run else None)
            print(f"auto-resume from: {resume}")
        from train import train

        trainer = train(cfg, resume=resume)
        rows = [{k: r.get(k) for k in ("epoch", "train_loss", "val_mAP")}
                for r in trainer.history]
        print(f"QAT-AB train[{args.arm}]", json.dumps(rows))
        return

    # eval: four cells — {float-trained, qat-trained} x {float, int8-PTQ}
    from test import evaluate

    table = {}
    for arm in ("float", "qat"):
        run = latest_run(args.save_dir, arm)
        if run is None:
            sys.exit(f"no trained {arm} run — run --phase train --arm {arm}")
        ckpt = best_or_last(run)
        cfg = build_cfg(args, arm)
        print(f"[{arm}] evaluating {ckpt}")
        for mode, quant in (("float", None), ("int8", "int8")):
            r = evaluate(cfg, ckpt, quantize=quant, calib_batches=4)
            table[f"{arm}/{mode}"] = float(r["val_mAP"])
            print(f"[{arm}/{mode}] val_mAP {r['val_mAP']:.5f}")
    for arm in ("float", "qat"):
        d = (table[f"{arm}/int8"] - table[f"{arm}/float"]) * 100
        print(f"{arm}-trained: float {table[f'{arm}/float']:.4f}  "
              f"int8-PTQ {table[f'{arm}/int8']:.4f}  "
              f"PTQ delta {d:+.2f} pt")
    print("QAT-AB eval", json.dumps(table))


if __name__ == "__main__":
    main()
