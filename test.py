"""Evaluate a checkpoint: val_loss + val_mAP (the reference's
``test_yolov*.py`` Trainer.validate flow, test_yolov3.py:16-53).

    python test.py --cfg configs/yolov3_voc.yaml --ckpt saved/.../checkpoints/best
"""

from __future__ import annotations

import argparse

from podtpu.config import get_configs, setup_platform
from podtpu.data import Loader, build_datasets
from podtpu.train.trainer import Trainer, restore_weights


def evaluate(cfg: dict, ckpt: str | None, report_dir: str | None = None,
             quantize: str | None = None, calib_batches: int = 4) -> dict:
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
    if quantize == "int8":
        # static PTQ eval: calibrate on val batches, rebuild the eval step
        # with the quant collection (ConvBnAct switches to int8 convs)
        import numpy as np

        from podtpu.export.quantize import quantize_for_serving
        from podtpu.models import build_model
        from podtpu.train.steps import make_eval_step

        calib = []
        for batch in val_loader:
            x = np.asarray(batch["img"])
            if x.dtype == np.uint8:
                x = x.astype(np.float32) / 255.0
            calib.append(x)
            if len(calib) >= calib_batches:
                break
        variables = {"params": trainer.state.params,
                     "batch_stats": trainer.state.batch_stats}
        qvars = quantize_for_serving(build_model(cfg), variables, calib)
        trainer.eval_step = make_eval_step(
            cfg, trainer.mesh, extra_variables={"quant": qvars["quant"]})
        print(f"int8 PTQ eval (calibrated on {len(calib)} val batches)")
    result = trainer.validate(val_loader)
    print(f"val_loss: {result['val_loss']:.5f}")
    print(f"val_mAP: {result['val_mAP']:.5f}")
    if report_dir:
        from podtpu.metrics.plots import write_eval_report
        from podtpu.utils.viz import load_names
        import os

        names = (load_names(cfg["names"])
                 if cfg.get("names") and os.path.exists(cfg["names"])
                 else [str(i) for i in range(cfg["num_classes"])])
        paths = write_eval_report(trainer.map_metric, names, report_dir,
                                  cfg.get("conf_threshold", 0.25))
        print(f"report: {paths}")
        with open(paths["table"]) as f:
            print(f.read())
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True, type=str)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--report", type=str, default=None,
                    help="write per-class AP table + PR curves + confusion "
                         "matrix to this directory")
    ap.add_argument("--quantize", type=str, default=None, choices=["int8"],
                    help="evaluate the int8-PTQ model (accuracy-delta check "
                         "for the quantized serving artifact)")
    ap.add_argument("--calib-batches", type=int, default=4)
    ap.add_argument("--platform", type=str, default=None,
                    help="pin JAX backend (e.g. cpu) for local runs")
    args = ap.parse_args()
    setup_platform(args.platform)
    evaluate(get_configs(args.cfg), args.ckpt, args.report,
             quantize=args.quantize, calib_batches=args.calib_batches)


if __name__ == "__main__":
    main()
