"""Per-version wrapper (reference surface: train_yolov4-tiny.py); defaults
--cfg to configs/yolov4-tiny_voc.yaml. All logic lives in train.py."""
import argparse

from podtpu.config import get_configs
from train import train

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", type=str, default="configs/yolov4-tiny_voc.yaml")
    ap.add_argument("--resume", type=str, default=None)
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()
    train(get_configs(args.cfg), resume=args.resume, epochs=args.epochs)
