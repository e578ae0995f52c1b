"""Per-version wrapper (reference surface: test_yolov4-tiny.py)."""
import argparse

from podtpu.config import get_configs
from test import evaluate

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", type=str, default="configs/yolov4-tiny_voc.yaml")
    ap.add_argument("--ckpt", type=str, default=None)
    args = ap.parse_args()
    evaluate(get_configs(args.cfg), args.ckpt)
