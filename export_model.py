"""Export a trained model to a StableHLO artifact (torch2onnx.py analog).

    python export_model.py --cfg configs/yolov3_voc.yaml [--ckpt ...] \
        --out model.stablehlo [--inspect]

Options beyond the forward graph:
  --with-postprocess   export the full serving unit fwd+decode+NMS (the
                       reference's DecodeYoloVx deployment graph,
                       utils/yolov3_utils.py:62-90)
  --fold-bn            fold BN stats into conv kernels before export
                       (onnxsim fuse-bn role)
  --validate-npu       validate the artifact op set against the NPU
                       whitelist and fail on unsupported ops
                       (onnx2novaonnx_converter.py role)
  --annotate out.json  write the sanitized per-layer annotation map
  --quantize int8      static PTQ: calibrate activation scales on training
                       batches (--calib-batches) and export int8 convs
                       (the int8-NPU deployment role; see
                       podtpu/export/quantize.py)
  --format tflite|savedmodel
                       export a LiteRT flatbuffer / TF-Serving SavedModel
                       instead of StableHLO (podtpu/export/tflite.py) —
                       the interchange formats edge-NPU toolchains ingest;
                       --quantize int8 becomes full-integer TFLite PTQ and
                       --quantize dynamic (tflite-only) dynamic-range int8
"""

from __future__ import annotations

import argparse
import json

import jax

from podtpu.config import get_configs, setup_platform
from podtpu.export.stablehlo import export_stablehlo, inspect_exported
from podtpu.models import build_model
from podtpu.train.state import create_train_state
from podtpu.train.trainer import restore_eval_weights


def _calibration_batches(cfg: dict, shape, n: int):
    """Calibration inputs for PTQ: real validation images when the cfg has
    data lists, else uniform noise (with a warning — scales will be crude)."""
    import numpy as np

    try:
        from podtpu.data import Loader, build_datasets

        _, val_ds = build_datasets(cfg)
        loader = Loader(val_ds, batch_size=shape[0], shuffle=False,
                        max_annots=cfg.get("max_annots", 64),
                        workers=1)
        out = []
        for batch in loader:
            x = np.asarray(batch["img"])
            if x.dtype == np.uint8:
                x = x.astype(np.float32) / 255.0
            out.append(x)
            if len(out) >= n:
                break
        if out:
            return out
    except Exception as e:  # noqa: BLE001 — fall back to noise
        print(f"calibration loader unavailable ({e}); using uniform noise")
    rng = np.random.default_rng(0)
    return [rng.uniform(0, 1, shape).astype(np.float32) for _ in range(n)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True, type=str)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--use-ema", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="export the checkpoint's EMA shadow weights "
                         "(default: auto — EMA when the config's ema.eval "
                         "is on, so the artifact matches test.py)")
    ap.add_argument("--out", type=str, default="model.stablehlo")
    ap.add_argument("--batch", type=str, default="1",
                    help="batch size; 'dyn' exports a symbolic batch "
                         "dimension (one StableHLO artifact serves any "
                         "batch — the dynamic-axes role; stablehlo only)")
    ap.add_argument("--inspect", action="store_true")
    ap.add_argument("--with-postprocess", action="store_true",
                    help="export fwd+decode+NMS serving graph")
    ap.add_argument("--fold-bn", action="store_true",
                    help="fold BN into conv kernels before export")
    ap.add_argument("--validate-npu", action="store_true",
                    help="fail if the artifact uses non-whitelisted ops")
    ap.add_argument("--annotate", type=str, default=None,
                    help="write per-layer annotation map to this json")
    ap.add_argument("--format", type=str, default="stablehlo",
                    choices=["stablehlo", "tflite", "savedmodel"])
    ap.add_argument("--quantize", type=str, default=None,
                    choices=["int8", "dynamic"],
                    help="static PTQ for the artifact (int8 convs); "
                         "'dynamic' = tflite dynamic-range int8")
    ap.add_argument("--calib-batches", type=int, default=8,
                    help="calibration batches for --quantize")
    ap.add_argument("--platforms", type=str, default="cpu,tpu",
                    help="comma-separated export targets; a single platform "
                         "freezes the artifact for one deployment target "
                         "(required for --validate-npu: multi-platform "
                         "dispatch uses off-whitelist stablehlo.case)")
    ap.add_argument("--platform", type=str, default=None,
                    help="pin JAX backend (e.g. cpu) for local runs")
    args = ap.parse_args()
    # flag-compatibility checks BEFORE the (expensive) restore/convert work
    if args.format in ("tflite", "savedmodel"):
        if args.annotate or args.validate_npu or args.inspect:
            ap.error("--annotate/--validate-npu/--inspect operate on "
                     "StableHLO artifacts (--format stablehlo)")
        if args.format == "savedmodel" and args.quantize:
            ap.error("--quantize applies to --format tflite/stablehlo")
    elif args.quantize == "dynamic":
        ap.error("--quantize dynamic is tflite-only (--format tflite)")
    setup_platform(args.platform)

    cfg = get_configs(args.cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    if args.ckpt:
        state = restore_eval_weights(args.ckpt, state, cfg,
                                     use_ema=args.use_ema)
    model = build_model(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.fold_bn:
        from podtpu.export.npu import fold_batchnorm

        variables = fold_batchnorm(variables)
        print("folded BN stats into conv kernels")
    if args.batch == "dyn":
        if args.format != "stablehlo":
            ap.error("--batch dyn needs --format stablehlo (tflite/"
                     "savedmodel trace a concrete shape)")
        if args.quantize:
            ap.error("--batch dyn is incompatible with --quantize "
                     "(calibration batches are concrete)")
        batch = None
    else:
        batch = int(args.batch)
    shape = (batch, cfg["input_size"], cfg["input_size"],
             cfg.get("in_channels", 3))
    if args.format in ("tflite", "savedmodel"):
        from podtpu.export.tflite import export_savedmodel, export_tflite

        if args.format == "savedmodel":
            path = export_savedmodel(model, variables, shape, args.out,
                                     cfg=cfg,
                                     with_postprocess=args.with_postprocess)
        else:
            rep = (_calibration_batches(cfg, shape, args.calib_batches)
                   if args.quantize == "int8" else None)
            path = export_tflite(model, variables, shape, args.out, cfg=cfg,
                                 with_postprocess=args.with_postprocess,
                                 quantize=args.quantize, rep_batches=rep)
        print(f"exported to {path}")
        return
    if args.quantize == "int8":
        from podtpu.export.quantize import quantize_for_serving

        variables = quantize_for_serving(
            model, variables,
            _calibration_batches(cfg, shape, args.calib_batches))
        print(f"int8 PTQ: calibrated on {args.calib_batches} batches")
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    if args.with_postprocess:
        from podtpu.export.stablehlo import export_serving

        path = export_serving(model, variables, cfg, shape, args.out,
                              platforms=platforms)
    else:
        path = export_stablehlo(model, variables, shape, args.out,
                                platforms=platforms)
    print(f"exported to {path}")
    if args.annotate:
        from podtpu.export.npu import annotate_for_npu

        info = annotate_for_npu(path, args.annotate)
        print(f"annotated {info['num_layers']} layers -> {args.annotate}")
    if args.validate_npu:
        from podtpu.export.npu import validate_for_npu

        report = validate_for_npu(path)  # raises on unsupported ops
        print(f"NPU validation ok: {len(report['ops'])} distinct ops, "
              "all whitelisted")
    if args.inspect:
        print(json.dumps(inspect_exported(path), indent=2))


if __name__ == "__main__":
    main()
