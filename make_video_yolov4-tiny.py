"""Per-version wrapper (reference surface: make_video_yolov4-tiny.py)."""
import argparse

from make_video import run
from podtpu.config import get_configs, setup_platform

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", type=str, default="configs/yolov4-tiny_voc.yaml")
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--input", type=str, required=True)
    ap.add_argument("--output", type=str, required=True)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    setup_platform(args.platform)
    run(get_configs(args.cfg), args.ckpt, args.input, args.output)
