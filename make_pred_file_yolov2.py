"""Per-version wrapper (reference surface: make_pred_file_yolov2.py)."""
import argparse

from make_pred_file import make_pred_files
from podtpu.config import get_configs, setup_platform

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", type=str, default="configs/yolov2_voc.yaml")
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    setup_platform(args.platform)
    make_pred_files(get_configs(args.cfg), args.ckpt, args.out)
