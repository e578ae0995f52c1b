"""Serving-artifact A/B: float vs int8-PTQ StableHLO on the attached chip.

Exports the fwd+decode+NMS serving graph twice (float and --quantize int8
equivalents), then benches both and prints a one-line JSON comparison:

    python tools/bench_serving.py --cfg configs/yolov3_voc.yaml \
        [--batch 128] [--iters 30] [--calib-batch 8]

Calibration uses uniform noise at --calib-batch (artifact exists for FPS
measurement; use export_model.py --quantize int8 with real data lists for a
deployable artifact). Run on the TPU only (never concurrently with bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _bench(path: str, iters: int) -> dict:
    import jax
    import numpy as np
    from jax import export as jexport

    # deserialize once; inspect_exported would render the whole MLIR module
    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    dims = [int(d) for d in exported.in_avals[0].shape]
    fn = jax.jit(exported.call)
    x = jax.device_put(
        np.random.default_rng(0).uniform(0, 1, dims).astype(np.float32))
    # Perturb via a TRACED delta: `x + python_const` bakes each k into a
    # fresh eager-add program, and the first artifact benched in the
    # process then pays `iters` tunnel compiles that later artifacts get
    # from the cache (measured: 2400 ms/iter of phantom cost on the first
    # bench_tta cell). One jitted add, reused across iters and artifacts.
    pert = jax.jit(lambda x, d: x + d)
    deltas = [jax.device_put(np.float32(k * 1e-6)) for k in range(iters)]
    out = fn(pert(x, deltas[0]))
    jax.block_until_ready(out)
    jax.device_get(out)
    t0 = time.perf_counter()
    # fresh input each iteration: the axon terminal memoizes identical
    # dispatches (same program + same buffers return in ~30 us off-chip)
    for k in range(iters):
        out = fn(pert(x, deltas[k]))
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), out)
    jax.device_get(out)
    dt = time.perf_counter() - t0
    return {"batch": dims[0], "ms_per_batch": 1000 * dt / iters,
            "fps": iters * dims[0] / dt,
            "artifact_mb": os.path.getsize(path) / 1e6}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--calib-batch", type=int, default=8)
    ap.add_argument("--deploy-profile", action="store_true",
                    help="overlay the recommended deployment profile "
                         "(tta.hflip + nms_options.multi_label; xla_early "
                         "NMS is already the default) so the benched "
                         "artifact matches the README's serving recipe")
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()

    from podtpu.config import get_configs, setup_platform

    setup_platform(args.platform)
    import jax
    import numpy as np

    from podtpu.export.quantize import quantize_for_serving
    from podtpu.export.stablehlo import export_serving
    from podtpu.models import build_model
    from podtpu.train.state import create_train_state

    cfg = get_configs(args.cfg)
    if args.deploy_profile:
        cfg["tta"] = {"hflip": True}
        cfg["nms_options"] = {**dict(cfg.get("nms_options") or {}),
                              "multi_label": True}
    model = build_model(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    size = cfg["input_size"]
    shape = (args.batch, size, size, cfg.get("in_channels", 3))

    rng = np.random.default_rng(0)
    calib = [rng.uniform(0, 1, (args.calib_batch, size, size, shape[3]))
             .astype(np.float32) for _ in range(2)]
    qvars = quantize_for_serving(model, variables, calib)

    with tempfile.TemporaryDirectory() as td:
        f_path = os.path.join(td, "serve_f.stablehlo")
        q_path = os.path.join(td, "serve_q.stablehlo")
        export_serving(model, variables, cfg, shape, f_path)
        export_serving(model, qvars, cfg, shape, q_path)
        f = _bench(f_path, args.iters)
        q = _bench(q_path, args.iters)
    print(json.dumps({
        "model": cfg["model"], "input_size": size,
        "profile": "deploy" if args.deploy_profile else "plain",
        "float": {k: round(v, 2) for k, v in f.items()},
        "int8": {k: round(v, 2) for k, v in q.items()},
        "speedup": round(q["fps"] / f["fps"], 3),
    }))


if __name__ == "__main__":
    main()
