"""COCO-json predictions from a COCO annotation file + in-process COCOeval
when pycocotools is available (yolo2coco_pred_file_yolov3.py:19-121 analog).

Predictions are rescaled from the model's square input back to each image's
original (width, height) — the reference resizes without letterbox on this
path, so a plain scale is the faithful mapping.

    python yolo2coco_pred_file.py --cfg ... --ckpt ... --json annotations.json \
        --out results.json
"""

from __future__ import annotations

import argparse
import json
import os

import cv2
import numpy as np

from podtpu.config import get_configs, setup_platform
from podtpu.train.trainer import Trainer, restore_eval_weights


def coco_record(image_id, det, sx: float, sy: float) -> dict:
    """One COCO-format prediction record (the schema of the reference's
    checked-in results.json — locked by tests/test_coco_metrics.py)."""
    cx, cy, w, h, conf, cls = det
    return {
        "image_id": image_id,
        "category_id": int(cls) + 1,  # COCO categories are 1-based
        "bbox": [
            round(float((cx - w / 2) * sx), 2),
            round(float((cy - h / 2) * sy), 2),
            round(float(w * sx), 2),
            round(float(h * sy), 2),
        ],
        "score": round(float(conf), 5),
    }


def run(cfg: dict, ckpt: str | None, ann_json: str, out_json: str,
        artifact: str | None = None):
    with open(ann_json, "r") as f:
        coco = json.load(f)
    images = coco["images"]
    img_dir = os.path.dirname(ann_json)

    if artifact:
        # score the deployed graph itself (exported --with-postprocess)
        from podtpu.export.runner import artifact_runner

        try:
            run_artifact, art_batch = artifact_runner(artifact)
        except ValueError as e:
            raise SystemExit(str(e))
        trainer = None
    else:
        trainer = Trainer(cfg, use_mesh=False, eval_only=True)
        if ckpt:
            trainer.state = restore_eval_weights(ckpt, trainer.state, cfg)
    size = cfg["input_size"]

    results = []
    for info in images:
        path = os.path.join(img_dir, info["file_name"])
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        h0, w0 = img.shape[:2]
        inp = cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
        inp = cv2.cvtColor(inp, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        if artifact:
            x = inp[None]
            if art_batch and art_batch > 1:  # fixed-batch artifact: tile up
                x = np.tile(x, (art_batch, 1, 1, 1))
            dets, valid = run_artifact(x)
            dets = dets[0][valid[0]]
        else:
            batch = {
                "img": inp[None],
                "annot": -np.ones((1, cfg["max_annots"], 5), np.float32),
            }
            _, dets, valid = trainer.eval_step(trainer.state,
                                               trainer._put(batch))
            dets = np.asarray(dets[0])[np.asarray(valid[0])]
        sx, sy = w0 / size, h0 / size
        for det in dets:
            results.append(coco_record(info["id"], det, sx, sy))

    with open(out_json, "w") as f:
        json.dump(results, f)
    print(f"wrote {len(results)} detections to {out_json}")

    try:
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval

        gt = COCO(ann_json)
        dt = gt.loadRes(out_json)
        ev = COCOeval(gt, dt, "bbox")
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
    except ImportError:
        # built-in COCO-style evaluator (podtpu/metrics/coco.py)
        from podtpu.metrics.coco import coco_eval

        img_index = {info["id"]: i for i, info in enumerate(images)}
        true_rows, pred_rows = [], []
        for ann in coco.get("annotations", []):
            x, y, w, h = ann["bbox"]
            true_rows.append([
                img_index[ann["image_id"]], x + w / 2, y + h / 2, w, h,
                1.0, ann["category_id"] - 1,
            ])
        for det in results:
            x, y, w, h = det["bbox"]
            pred_rows.append([
                img_index[det["image_id"]], x + w / 2, y + h / 2, w, h,
                det["score"], det["category_id"] - 1,
            ])
        num_classes = cfg["num_classes"]
        r = coco_eval(np.asarray(true_rows, np.float32),
                      np.asarray(pred_rows, np.float32), num_classes)
        print("pycocotools not installed; built-in COCO-style eval:")
        print(f"  AP@[.5:.95] = {r['AP']:.4f}  AP50 = {r['AP50']:.4f}  "
              f"AP75 = {r['AP75']:.4f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True, type=str)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--artifact", type=str, default=None,
                    help="emit COCO results from an exported serving "
                         "artifact (.stablehlo/.tflite from export_model.py "
                         "--with-postprocess) instead of a checkpoint")
    ap.add_argument("--json", required=True, type=str,
                    help="COCO annotation json")
    ap.add_argument("--out", type=str, default="results.json")
    ap.add_argument("--platform", type=str, default=None,
                    help="pin JAX backend (e.g. cpu) for local runs")
    args = ap.parse_args()
    if args.artifact and args.ckpt:
        ap.error("--artifact runs the exported graph as-is; --ckpt applies "
                 "to checkpoint predictions")
    setup_platform(args.platform)
    run(get_configs(args.cfg), args.ckpt, args.json, args.out,
        artifact=args.artifact)


if __name__ == "__main__":
    main()
