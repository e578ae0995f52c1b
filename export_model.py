"""Export a trained model to a StableHLO artifact (torch2onnx.py analog).

    python export_model.py --cfg configs/yolov3_voc.yaml [--ckpt ...] \
        --out model.stablehlo [--inspect]
"""

from __future__ import annotations

import argparse
import json

import jax

from podtpu.config import get_configs, setup_platform
from podtpu.export.stablehlo import export_stablehlo, inspect_exported
from podtpu.models import build_model
from podtpu.train.state import create_train_state
from podtpu.train.trainer import restore_weights


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True, type=str)
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--out", type=str, default="model.stablehlo")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--inspect", action="store_true")
    ap.add_argument("--platform", type=str, default=None,
                    help="pin JAX backend (e.g. cpu) for local runs")
    args = ap.parse_args()
    setup_platform(args.platform)

    cfg = get_configs(args.cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    if args.ckpt:
        state = restore_weights(args.ckpt, state)
    model = build_model(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    shape = (args.batch, cfg["input_size"], cfg["input_size"],
             cfg.get("in_channels", 3))
    path = export_stablehlo(model, variables, shape, args.out)
    print(f"exported to {path}")
    if args.inspect:
        print(json.dumps(inspect_exported(path), indent=2))


if __name__ == "__main__":
    main()
