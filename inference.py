"""Interactive / batch-1 inference over the validation list with per-image
latency (inference_yolov3.py:19-97 analog). Headless by default: tagged
GT(red)/pred(green) images go to ``--out``; ``--show`` opens cv2 windows.

    python inference.py --cfg configs/yolov3_voc.yaml --ckpt ... --out /tmp/vis
"""

from __future__ import annotations

import argparse
import os
import time

import cv2
import numpy as np

from podtpu.config import get_configs, setup_platform
from podtpu.data import Loader, build_datasets
from podtpu.train.trainer import Trainer, restore_eval_weights
from podtpu.utils.viz import annots_to_boxes, draw_boxes, load_names


def inference(cfg: dict, ckpt: str | None, out_dir: str | None,
              show: bool = False, limit: int | None = None,
              artifact: str | None = None):
    _, val_ds = build_datasets(cfg)
    loader = Loader(val_ds, batch_size=1, shuffle=False,
                    max_annots=cfg["max_annots"], workers=1)
    if artifact:
        # visual spot-check of the deployed graph itself (exported with
        # --with-postprocess); single images tile up to the artifact batch
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
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    size = cfg["input_size"]
    for idx, batch in enumerate(loader):
        if limit is not None and idx >= limit:
            break
        batch.pop("n_valid", None)
        if artifact:
            x = prepare_input(batch["img"])
            if art_batch and art_batch > 1:  # fixed-batch artifact: tile up
                x = np.tile(x, (art_batch, 1, 1, 1))
            t0 = time.perf_counter()
            dets, valid = run_artifact(x)
            dets = dets[0][valid[0]]
        else:
            dev_batch = trainer._put(batch)
            t0 = time.perf_counter()
            _, dets, valid = trainer.eval_step(trainer.state, dev_batch)
            dets = np.asarray(dets[0])[np.asarray(valid[0])]
        dt = (time.perf_counter() - t0) * 1000
        # an artifact exported at batch B executes B tiled copies: label the
        # time as the batch's, not a single image's
        unit = (f"ms/batch-{art_batch}"
                if artifact and art_batch and art_batch > 1 else "ms")
        print(f"[{idx}] inference: {dt:.2f} {unit}, {len(dets)} boxes")

        raw = batch["img"][0]
        img = (raw if raw.dtype == np.uint8 else
               (raw * 255).astype(np.uint8))
        img = cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
        img = draw_boxes(img, annots_to_boxes(batch["annot"][0], size),
                         names, color=(0, 0, 255))
        img = draw_boxes(img, dets, names, color=(0, 255, 0))
        if out_dir:
            cv2.imwrite(os.path.join(out_dir, f"{idx:05d}.jpg"), img)
        if show:
            cv2.imshow("inference", img)
            key = cv2.waitKey(0)
            if key == 27:  # ESC
                break
            if key == ord("c") and out_dir:
                cv2.imwrite(os.path.join(out_dir, f"capture_{idx:05d}.jpg"), img)
    if show:
        cv2.destroyAllWindows()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True, type=str)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--artifact", type=str, default=None,
                    help="run an exported serving artifact "
                         "(.stablehlo/.tflite from export_model.py "
                         "--with-postprocess) instead of a checkpoint")
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--show", action="store_true")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--platform", type=str, default=None,
                    help="pin JAX backend (e.g. cpu) for local runs")
    args = ap.parse_args()
    if args.artifact and args.ckpt:
        ap.error("--artifact runs the exported graph as-is; --ckpt applies "
                 "to checkpoint inference")
    setup_platform(args.platform)
    inference(get_configs(args.cfg), args.ckpt, args.out, args.show,
              args.limit, artifact=args.artifact)


if __name__ == "__main__":
    main()
