"""Evaluate a checkpoint: val_loss + val_mAP (the reference's
``test_yolov*.py`` Trainer.validate flow, test_yolov3.py:16-53).

    python test.py --cfg configs/yolov3_voc.yaml --ckpt saved/.../checkpoints/best
"""

from __future__ import annotations

import argparse

from podtpu.config import get_configs, setup_platform
from podtpu.data import Loader, build_datasets
from podtpu.train.trainer import Trainer, restore_weights


def evaluate(cfg: dict, ckpt: str | None) -> dict:
    _, val_ds = build_datasets(cfg)
    val_loader = Loader(
        val_ds,
        batch_size=cfg["batch_size"],
        shuffle=False,
        max_annots=cfg["max_annots"],
        workers=cfg["workers"],
    )
    trainer = Trainer(cfg, eval_only=True)
    if ckpt:
        trainer.state = restore_weights(ckpt, trainer.state)
    result = trainer.validate(val_loader)
    print(f"val_loss: {result['val_loss']:.5f}")
    print(f"val_mAP: {result['val_mAP']:.5f}")
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True, type=str)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--platform", type=str, default=None,
                    help="pin JAX backend (e.g. cpu) for local runs")
    args = ap.parse_args()
    setup_platform(args.platform)
    evaluate(get_configs(args.cfg), args.ckpt)


if __name__ == "__main__":
    main()
