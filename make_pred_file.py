"""Write Cartucho/mAP-format prediction files, one txt per image:
``class_name conf xmin ymin xmax ymax`` (make_pred_file_yolov3.py:15-97
analog) — the reference's external-calculator cross-validation path.

    python make_pred_file.py --cfg ... --ckpt ... --out mAP/input/detection-results
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from podtpu.config import get_configs, setup_platform
from podtpu.data import Loader, build_datasets
from podtpu.train.trainer import Trainer, restore_eval_weights
from podtpu.utils.viz import load_names


def make_pred_files(cfg: dict, ckpt: str | None, out_dir: str,
                    artifact: str | None = None):
    _, val_ds = build_datasets(cfg)
    loader = Loader(val_ds, batch_size=1, shuffle=False,
                    max_annots=cfg["max_annots"], workers=1)
    if artifact:
        # score the deployed graph itself (the reference's onnx flow:
        # onnx_inference -> make_pred_file -> external mAP calculator)
        from podtpu.export.runner import artifact_runner, prepare_input

        try:
            run_artifact, art_batch = artifact_runner(artifact)
        except ValueError as e:
            raise SystemExit(str(e))
        trainer = None
    else:
        trainer = Trainer(cfg, use_mesh=False, eval_only=True)
        if ckpt:
            trainer.state = restore_eval_weights(ckpt, trainer.state, cfg)
    names = load_names(cfg["names"]) if cfg.get("names") and \
        os.path.exists(cfg["names"]) else [str(i) for i in range(cfg["num_classes"])]
    os.makedirs(out_dir, exist_ok=True)

    for idx, batch in enumerate(loader):
        batch.pop("n_valid", None)
        if artifact:
            x = prepare_input(batch["img"])
            if art_batch and art_batch > 1:  # fixed-batch artifact: tile up
                x = np.tile(x, (art_batch, 1, 1, 1))
            dets, valid = run_artifact(x)
            dets = dets[0][valid[0]]
        else:
            dev_batch = trainer._put(batch)
            _, dets, valid = trainer.eval_step(trainer.state, dev_batch)
            dets = np.asarray(dets[0])[np.asarray(valid[0])]
        img_path = val_ds.imgs[idx]
        stem = os.path.splitext(os.path.basename(img_path))[0]
        lines = []
        for cx, cy, w, h, conf, cls in dets:
            lines.append(
                f"{names[int(cls)]} {conf:.6f} "
                f"{cx - w / 2:.2f} {cy - h / 2:.2f} {cx + w / 2:.2f} {cy + h / 2:.2f}"
            )
        with open(os.path.join(out_dir, stem + ".txt"), "w") as f:
            f.write("\n".join(lines) + ("\n" if lines else ""))
    print(f"wrote predictions for {len(val_ds)} images to {out_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True, type=str)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--artifact", type=str, default=None,
                    help="emit predictions from an exported serving "
                         "artifact (.stablehlo/.tflite from export_model.py "
                         "--with-postprocess) instead of a checkpoint")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--platform", type=str, default=None,
                    help="pin JAX backend (e.g. cpu) for local runs")
    args = ap.parse_args()
    if args.artifact and args.ckpt:
        ap.error("--artifact runs the exported graph as-is; --ckpt applies "
                 "to checkpoint predictions")
    setup_platform(args.platform)
    make_pred_files(get_configs(args.cfg), args.ckpt, args.out,
                    artifact=args.artifact)


if __name__ == "__main__":
    main()
