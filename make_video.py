"""Video -> video inference (make_video_yolov4-tiny.py:19-108 analog):
read frames, run the jitted eval step, rescale boxes to frame dims, draw,
write out.

    python make_video.py --cfg ... --ckpt ... --input in.mp4 --output out.mp4
"""

from __future__ import annotations

import argparse
import os
import time

import cv2
import numpy as np

from podtpu.config import get_configs, setup_platform
from podtpu.train.trainer import Trainer, restore_eval_weights
from podtpu.utils.viz import draw_boxes, load_names


def run(cfg: dict, ckpt: str | None, input_path: str, output_path: str,
        artifact: str | None = None):
    cap = cv2.VideoCapture(input_path)
    if not cap.isOpened():
        raise FileNotFoundError(input_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 30
    w0 = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h0 = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    writer = cv2.VideoWriter(
        output_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w0, h0)
    )

    if artifact:
        # run the deployed graph itself (exported --with-postprocess)
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
    names = load_names(cfg["names"]) if cfg.get("names") and \
        os.path.exists(cfg["names"]) else [str(i) for i in range(cfg["num_classes"])]
    size = cfg["input_size"]
    pad_annot = -np.ones((1, cfg["max_annots"], 5), np.float32)

    n = 0
    t0 = time.perf_counter()
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        inp = cv2.resize(frame, (size, size), interpolation=cv2.INTER_LINEAR)
        inp = cv2.cvtColor(inp, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        if artifact:
            x = inp[None]
            if art_batch and art_batch > 1:  # fixed-batch artifact: tile up
                x = np.tile(x, (art_batch, 1, 1, 1))
            dets, valid = run_artifact(x)
            dets = dets[0][valid[0]].copy()
        else:
            batch = {"img": inp[None], "annot": pad_annot}
            _, dets, valid = trainer.eval_step(trainer.state,
                                               trainer._put(batch))
            dets = np.asarray(dets[0])[np.asarray(valid[0])].copy()
        if len(dets):
            dets[:, [0, 2]] *= w0 / size
            dets[:, [1, 3]] *= h0 / size
        frame = draw_boxes(frame, dets, names, color=(0, 255, 0))
        writer.write(frame)
        n += 1
    writer.release()
    cap.release()
    dt = time.perf_counter() - t0
    print(f"{n} frames in {dt:.1f}s ({n / dt:.1f} fps) -> {output_path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True, type=str)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--artifact", type=str, default=None,
                    help="run an exported serving artifact "
                         "(.stablehlo/.tflite from export_model.py "
                         "--with-postprocess) instead of a checkpoint")
    ap.add_argument("--input", required=True, type=str)
    ap.add_argument("--output", required=True, type=str)
    ap.add_argument("--platform", type=str, default=None,
                    help="pin JAX backend (e.g. cpu) for local runs")
    args = ap.parse_args()
    if args.artifact and args.ckpt:
        ap.error("--artifact runs the exported graph as-is; --ckpt applies "
                 "to checkpoint inference")
    setup_platform(args.platform)
    run(get_configs(args.cfg), args.ckpt, args.input, args.output,
        artifact=args.artifact)


if __name__ == "__main__":
    main()
