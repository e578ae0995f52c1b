"""Evaluate a checkpoint: val_loss + val_mAP (the reference's
``test_yolov*.py`` Trainer.validate flow, test_yolov3.py:16-53).

    python test.py --cfg configs/yolov3_voc.yaml --ckpt saved/.../checkpoints/best
"""

from __future__ import annotations

import argparse

from podtpu.config import get_configs, setup_platform
from podtpu.data import Loader, build_datasets
from podtpu.train.trainer import Trainer, restore_eval_weights


def evaluate(cfg: dict, ckpt: str | None, report_dir: str | None = None,
             quantize: str | None = None, calib_batches: int = 4,
             use_ema: bool | None = None) -> dict:
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
        trainer.state = restore_eval_weights(ckpt, trainer.state, cfg,
                                             use_ema=use_ema)
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


def evaluate_artifact(cfg: dict, artifact: str,
                      report_dir: str | None = None) -> dict:
    """Score an exported serving artifact (fwd+decode+NMS) through the full
    val-mAP pipeline — deployment-accuracy validation. The reference scores
    its deployed graph by running the ONNX artifact and re-using the mAP
    tooling (torch2onnx.py → onnx_inference.py → make_pred_file flow); this
    is the one-command equivalent: artifact val_mAP should match the
    checkpoint's ``test.py --ckpt`` number.
    """
    from podtpu.export.runner import artifact_runner, prepare_input
    from podtpu.metrics import MeanAveragePrecision

    try:
        run, batch = artifact_runner(artifact)
    except ValueError as e:
        raise SystemExit(str(e))
    if batch is None:  # symbolic-batch artifact: any size works
        batch = cfg["batch_size"]
    _, val_ds = build_datasets(cfg)
    val_loader = Loader(val_ds, batch_size=batch, shuffle=False,
                        max_annots=cfg["max_annots"], workers=cfg["workers"])
    metric = MeanAveragePrecision(cfg["num_classes"], cfg["input_size"])
    for b in val_loader:
        n_valid = b.pop("n_valid", b["img"].shape[0])
        dets, valid = run(prepare_input(b["img"]))
        metric.update_state(b["annot"][:n_valid], dets[:n_valid],
                            valid[:n_valid])
    val_map = metric.result()
    print(f"artifact val_mAP: {val_map:.5f}  ({artifact}, batch {batch})")
    if report_dir:
        import os

        from podtpu.metrics.plots import write_eval_report
        from podtpu.utils.viz import load_names

        names = (load_names(cfg["names"])
                 if cfg.get("names") and os.path.exists(cfg["names"])
                 else [str(i) for i in range(cfg["num_classes"])])
        paths = write_eval_report(metric, names, report_dir,
                                  cfg.get("conf_threshold", 0.25))
        print(f"report: {paths}")
    return {"val_mAP": val_map}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True, type=str)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--artifact", type=str, default=None,
                    help="score an exported serving artifact "
                         "(.stablehlo/.tflite from export_model.py "
                         "--with-postprocess) instead of a checkpoint: "
                         "full val mAP through the deployed graph")
    ap.add_argument("--report", type=str, default=None,
                    help="write per-class AP table + PR curves + confusion "
                         "matrix to this directory")
    ap.add_argument("--quantize", type=str, default=None, choices=["int8"],
                    help="evaluate the int8-PTQ model (accuracy-delta check "
                         "for the quantized serving artifact)")
    ap.add_argument("--calib-batches", type=int, default=4)
    ap.add_argument("--use-ema", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="evaluate the checkpoint's EMA shadow weights "
                         "(default: auto — EMA when the config's ema.eval "
                         "is on, matching how `best` was selected)")
    ap.add_argument("--platform", type=str, default=None,
                    help="pin JAX backend (e.g. cpu) for local runs")
    args = ap.parse_args()
    if args.artifact and (args.ckpt or args.quantize):
        ap.error("--artifact evaluates the exported graph as-is; "
                 "--ckpt/--quantize apply to checkpoint evaluation")
    setup_platform(args.platform)
    if args.artifact:
        evaluate_artifact(get_configs(args.cfg), args.artifact, args.report)
        return
    evaluate(get_configs(args.cfg), args.ckpt, args.report,
             quantize=args.quantize, calib_batches=args.calib_batches,
             use_ema=args.use_ema)


if __name__ == "__main__":
    main()
