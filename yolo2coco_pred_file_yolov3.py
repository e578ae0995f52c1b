"""Per-version wrapper (reference surface: yolo2coco_pred_file_yolov3.py)."""
import argparse

from podtpu.config import get_configs, setup_platform
from yolo2coco_pred_file import run

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", type=str, default="configs/yolov3_voc.yaml")
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--json", type=str, required=True)
    ap.add_argument("--out", type=str, default="results.json")
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    setup_platform(args.platform)
    run(get_configs(args.cfg), args.ckpt, args.json, args.out)
