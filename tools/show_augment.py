"""Augmentation visualizer — the reference's dataset ``__main__`` smoke
blocks (dataset/detection/yolo_dataset.py:111-192, datasets.py:242-307)
show augmented-vs-original images with drawn boxes in cv2 windows; this
headless counterpart writes side-by-side panels to a directory so a recipe's
augmentation distribution (mosaic, copy_paste, device_geom draws included)
can be eyeballed before a long run.

    python tools/show_augment.py --cfg configs/yolov3_voc.yaml \
        --out /tmp/aug_vis --n 8 [--seed 0]
"""

from __future__ import annotations

import argparse
import os
import sys

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from podtpu.config import get_configs  # noqa: E402
from podtpu.data.dataset import YoloTxtDataset, build_datasets  # noqa: E402
from podtpu.utils.viz import draw_boxes, load_names  # noqa: E402


def _to_bgr_uint8(im: np.ndarray) -> np.ndarray:
    if im.dtype != np.uint8:
        im = (np.clip(im, 0.0, 1.0) * 255.0).astype(np.uint8)
    return cv2.cvtColor(im, cv2.COLOR_RGB2BGR)


def _panel(sample, size: int, names) -> np.ndarray:
    im, boxes = sample[0], sample[1]
    if len(sample) == 3:
        # device_geom sample: the host ships un-warped pixels + the
        # (sx, sy, bx, by) row; render what the device-side warp produces
        # so the drawn (already-transformed) labels line up
        from podtpu.data.device_aug import separable_affine

        geom = np.asarray(sample[2], np.float32)
        if not np.allclose(geom, [1.0, 1.0, 0.0, 0.0]):
            imf = np.asarray(im, np.float32)
            if np.asarray(im).dtype == np.uint8:
                imf = imf / 255.0
            im = np.asarray(separable_affine(imf[None], geom[None]))[0]
    rows = np.zeros((len(boxes), 6), np.float32)
    if len(boxes):
        rows[:, :4] = np.asarray(boxes)[:, :4] * size
        rows[:, 4] = 1.0
        rows[:, 5] = np.asarray(boxes)[:, 4]
    return draw_boxes(np.ascontiguousarray(_to_bgr_uint8(np.asarray(im))),
                      rows, names)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default="cpu",
                    help="backend for the device_geom warp preview "
                         "(cpu default: this is a host-side tool)")
    args = ap.parse_args()
    from podtpu.config import setup_platform

    setup_platform(args.platform)

    cfg = get_configs(args.cfg)
    size = int(cfg["input_size"])
    names_path = cfg.get("names") or ""
    names = load_names(names_path) if os.path.exists(names_path) else []
    train_ds, _ = build_datasets(cfg)
    # the plain (un-augmented) view of the same images for the right panel
    plain_ds = YoloTxtDataset(cfg["train_list"], size, False,
                              train_ds.pipeline, output_uint8=False)

    os.makedirs(args.out, exist_ok=True)
    for i in range(args.n):
        idx = i % len(train_ds)
        aug = _panel(train_ds.get(idx, seed=args.seed + i), size, names)
        orig = _panel(plain_ds.get(idx, seed=0), size, names)
        cv2.imwrite(os.path.join(args.out, f"sample_{i:03d}.jpg"),
                    np.hstack([aug, orig]))
    print(f"wrote {args.n} augmented|original panels to {args.out}")


if __name__ == "__main__":
    main()
