"""Per-version wrapper (reference surface: inference_yolov3.py)."""
import argparse

from inference import inference
from podtpu.config import get_configs

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", type=str, default="configs/yolov3_voc.yaml")
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--show", action="store_true")
    ap.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()
    inference(get_configs(args.cfg), args.ckpt, args.out, args.show, args.limit)
