"""Pretrain→fine-tune accuracy evidence for the backbone-pretraining subsystem.

The reference ships a tiny-imagenet-pretrained darknet19 checkpoint and
partial-loads it into its detectors (/root/reference/models/backbone/
darknet.py:134-161). podtpu has the same workflow (pretrain_darknet.py +
cfg ``backbone_pretrained``) but — through round 4 — no measured evidence
it helps. This tool produces that evidence on the real TPU:

  stage ``pretrain``   — generate a synthetic tiny-imagenet-style
                         classification set (same color-shape vocabulary as
                         the detection set) and train Darknet19Classifier
                         to convergence (per-epoch val top-1 curve), saving
                         the backbone npz;
  stage ``scratch``    — the standard 2000/400 synthetic @256 detector soak
                         (yolov2-darknet19, 30 epochs, val every epoch),
                         random-init backbone;
  stage ``pretrained`` — the identical soak with ``backbone_pretrained``
                         pointing at stage-1's npz (same seeds/recipe).

One stage per invocation (resumable slices, like device_aug_ab.py), or
``--stage all``. Output: per-epoch val_mAP rows for both arms — the A/B is
the mAP-at-fixed-epoch gap.

    python tools/pretrain_ab.py --stage all 2>&1 | tee /tmp/pretrain_ab.log
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = os.environ.get("PODTPU_PRETRAIN_AB_WORK", "/tmp/pretrain_ab")
NPZ = os.path.join(WORK, "darknet19_synth_pretrained.npz")

# v2 anchors live in GRID units of the 13x13 (here 8x8 @256) output map;
# the synthetic boxes span size/8..size/3 px = 1..2.7 cells.
SCALED_ANCHORS = [[1.1, 1.1], [1.6, 2.2], [2.2, 1.6], [1.4, 1.4], [2.5, 2.5]]


def stage_pretrain(platform: str | None) -> None:
    import subprocess

    from podtpu.data.synthetic import generate_classification

    cls_train = os.path.join(WORK, "cls", "train")
    cls_val = os.path.join(WORK, "cls", "val")
    # guard on the LAST artifact written: a crash between the two
    # generations must not leave a skipped-but-incomplete state
    if not os.path.isdir(cls_val):
        generate_classification(cls_train, n_per_class=250, size=64,
                                num_classes=20, seed=11)
        generate_classification(cls_val, n_per_class=50, size=64,
                                num_classes=20, seed=12)
        print("classification set written", flush=True)
    cmd = [sys.executable, os.path.join(REPO, "pretrain_darknet.py"),
           "--data", cls_train, "--val-data", cls_val, "--size", "64",
           "--batch", "128", "--epochs", "12", "--lr", "0.05",
           "--out", NPZ]
    if platform:
        cmd += ["--platform", platform]
    rc = subprocess.run(cmd).returncode
    if rc != 0:
        raise SystemExit(f"pretrain stage failed rc={rc}")


def stage_detector(arm: str, platform: str | None, epochs: int) -> None:
    from podtpu.config import setup_platform

    setup_platform(platform)

    det_data = os.path.join(WORK, "det")
    if not os.path.exists(os.path.join(det_data, "train.txt")):
        from podtpu.data.synthetic import generate

        # the standard accuracy-soak detection set (matches device_aug_ab)
        generate(det_data, n_train=2000, n_val=400, size=256,
                 num_classes=4, seed=3)
        print("detection set written", flush=True)

    cfg = yaml.safe_load(open(os.path.join(REPO, "configs/yolov2_voc.yaml")))
    cfg.update(
        dataset_name=f"pab-{arm}",
        input_size=256, num_classes=4, scaled_anchors=SCALED_ANCHORS,
        train_list=f"{det_data}/train.txt", val_list=f"{det_data}/val.txt",
        names=f"{det_data}/synth.names",
        epochs=epochs, batch_size=16, max_annots=8, workers=4,
        save_dir=os.path.join(WORK, "saved"), save_freq=100,
        cache_images=True, uint8_batches=True, compute_dtype="bfloat16",
        trainer_options={"check_val_every_n_epoch": 1},
        optimizer_options={"lr": 1e-3, "momentum": 0.9,
                           "weight_decay": 5e-4, "nesterov": True},
        scheduler_options={"burn_in": 100, "steps": [2000], "scales": [0.1]},
        backbone_pretrained=(NPZ if arm == "pretrained" else ""),
    )
    if arm == "pretrained":
        assert os.path.isfile(NPZ), f"{NPZ} missing — run --stage pretrain first"

    from train import train

    trainer = train(cfg)
    rows = [{k: r.get(k) for k in ("epoch", "train_loss", "val_mAP")}
            for r in trainer.history]
    print("PRETRAIN_AB", arm, json.dumps(rows), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", required=True,
                    choices=["pretrain", "scratch", "pretrained", "all"])
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    os.makedirs(WORK, exist_ok=True)

    if args.stage in ("pretrain", "all"):
        stage_pretrain(args.platform)
    for arm in ("scratch", "pretrained"):
        if args.stage in (arm, "all"):
            if args.stage == "all":
                # each detector arm in a fresh interpreter: train() builds a
                # full Trainer and the two arms must not share jit caches
                import subprocess

                rc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--stage", arm, "--epochs", str(args.epochs)]
                    + (["--platform", args.platform] if args.platform else []),
                ).returncode
                if rc != 0:
                    raise SystemExit(f"{arm} arm failed rc={rc}")
            else:
                stage_detector(arm, args.platform, args.epochs)


if __name__ == "__main__":
    main()
