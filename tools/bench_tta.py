"""TTA serving-cost A/B: exported fwd(+TTA)+decode+NMS graphs on the chip.

Exports the serving graph once per test-time-augmentation variant —
off / hflip / scales / hflip+scales (the same variants tools/tta_ab.py
scores for accuracy) — and times each artifact, printing a one-line JSON
with ms/batch + fps per variant and the relative cost over the baseline.

    python tools/bench_tta.py --cfg configs/yolov4-tiny_voc.yaml \
        [--batch 64] [--iters 30]

Run on the TPU only (never concurrently with bench.py). Timing follows
CLAUDE.md's rules via bench_serving._bench (fresh input per iteration,
device_get fence).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

VARIANTS = [
    ("off", None),
    ("hflip", {"hflip": True}),
    ("scales", {"hflip": False, "scales": [0.83, 0.67]}),
    ("hflip+scales", {"hflip": True, "scales": [0.83, 0.67]}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    from podtpu.config import get_configs, setup_platform

    setup_platform(args.platform)
    import jax

    from bench_serving import _bench
    from podtpu.export.stablehlo import export_serving
    from podtpu.models import build_model
    from podtpu.train.state import create_train_state

    cfg = get_configs(args.cfg)
    model = build_model(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    size = cfg["input_size"]
    shape = (args.batch, size, size, cfg.get("in_channels", 3))

    out = {"model": cfg["model"], "input_size": size, "batch": args.batch}
    base_ms = None
    with tempfile.TemporaryDirectory() as td:
        for name, tta in VARIANTS:
            c = dict(cfg)
            if tta is None:
                c.pop("tta", None)
            else:
                c["tta"] = tta
            path = os.path.join(td, f"serve_{name.replace('+', '_')}.stablehlo")
            export_serving(model, variables, c, shape, path)
            r = _bench(path, args.iters)
            if base_ms is None:
                base_ms = r["ms_per_batch"]
            out[name] = {"ms_per_batch": round(r["ms_per_batch"], 2),
                         "fps": round(r["fps"], 1),
                         "cost_x": round(r["ms_per_batch"] / base_ms, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
