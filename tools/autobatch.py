"""Auto-batch sizing from XLA's compile-time memory analysis.

The CUDA-world equivalent (Ultralytics ``autobatch.py``) probes batch sizes
by actually allocating until the allocator fails. On TPU nothing needs to
run: ``jit(train_step).lower(shapes).compile()`` is ahead-of-time — XLA
plans every buffer at compile time, and ``compiled.memory_analysis()``
reports the program's argument/output/temp footprint before a single byte
moves. This tool compiles the REAL train step (same donation, remat policy,
device-aug stack, and compiler options as training) at candidate batch
sizes and recommends the largest one whose planned peak fits in HBM.

    python tools/autobatch.py --cfg configs/yolov4-tiny_voc.yaml
    python tools/autobatch.py --cfg ... --batches 64,128,192 --frac 0.92

Peak model: ``arguments + outputs - aliased + temporaries``. With the
step's donated train state, outputs alias arguments, so the planned peak is
dominated by params/optimizer state (counted once) + activations (temp).
The measured knee on v5e (batch 128 for yolov4-tiny@416, RESULTS.md)
matches where this analysis crosses ~90% of the chip's 16 GB.

Single-device analysis: the per-chip batch is the unit that matters — under
pure DP multiply the recommendation by the data-axis size; FSDP/TP shrink
state per chip, so this single-chip number is then conservative.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def plan_memory(cfg: dict, batch_size: int) -> dict:
    """AOT-compile the train step at ``batch_size``; return planned bytes.

    Nothing executes and no arrays are materialized: the state is a
    ``jax.eval_shape`` skeleton and the batch is ``ShapeDtypeStruct``s
    shaped exactly like the loader's output for this config
    (uint8 vs float images, ``device_geom``'s extra ``geom`` leaf).
    """
    from podtpu.train.state import create_train_state
    from podtpu.train.steps import make_train_step

    state_shape = jax.eval_shape(
        lambda: create_train_state(cfg, jax.random.PRNGKey(0)))
    size = int(cfg["input_size"])
    img_dtype = (jnp.uint8 if bool(cfg.get("uint8_batches", True))
                 else jnp.float32)
    batch = {
        "img": jax.ShapeDtypeStruct(
            (batch_size, size, size, int(cfg.get("in_channels", 3))),
            img_dtype),
        "annot": jax.ShapeDtypeStruct(
            (batch_size, int(cfg["max_annots"]), 5), jnp.float32),
    }
    if bool(cfg.get("device_geom", False)):
        batch["geom"] = jax.ShapeDtypeStruct((batch_size, 4), jnp.float32)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)

    step = make_train_step(cfg, donate=True)
    ma = step.lower(state_shape, batch, rng).compile().memory_analysis()
    row = {
        "batch": batch_size,
        "arguments": int(ma.argument_size_in_bytes),
        "outputs": int(ma.output_size_in_bytes),
        "aliased": int(ma.alias_size_in_bytes),
        "temp": int(ma.temp_size_in_bytes),
    }
    row["peak"] = (row["arguments"] + row["outputs"] - row["aliased"]
                   + row["temp"])
    return row


def device_hbm_bytes(default_gb: float | None = None) -> int | None:
    """The device's memory capacity: ``memory_stats()['bytes_limit']`` where
    the backend reports it (TPU does), else ``default_gb``."""
    stats = jax.devices()[0].memory_stats()
    if stats and stats.get("bytes_limit"):
        return int(stats["bytes_limit"])
    if default_gb:
        return int(default_gb * (1 << 30))
    return None


def recommend(rows: list[dict], limit_bytes: int, frac: float = 0.9) -> int | None:
    """Largest analyzed batch whose planned peak fits ``frac * limit``."""
    fitting = [r["batch"] for r in rows if r["peak"] <= frac * limit_bytes]
    return max(fitting) if fitting else None


def _fmt(n: int) -> str:
    return f"{n / (1 << 30):7.2f}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True, type=str)
    ap.add_argument("--batches", type=str, default="32,64,128,192,256",
                    help="comma-separated candidate batch sizes")
    ap.add_argument("--frac", type=float, default=0.9,
                    help="usable fraction of HBM (headroom for the runtime, "
                         "infeed buffers, and fragmentation)")
    ap.add_argument("--hbm-gb", type=float, default=None,
                    help="device memory capacity override (GiB); default "
                         "reads the backend's bytes_limit (16 GiB on v5e)")
    ap.add_argument("--platform", type=str, default=None,
                    help="pin JAX backend (e.g. cpu) for local runs")
    args = ap.parse_args()

    from podtpu.config import get_configs, setup_platform

    setup_platform(args.platform)
    cfg = get_configs(args.cfg)
    limit = device_hbm_bytes(args.hbm_gb)

    print(f"device: {jax.devices()[0].device_kind}  "
          + (f"capacity {limit / (1 << 30):.1f} GiB  usable {args.frac:.0%}"
             if limit else "capacity unknown (pass --hbm-gb)"))
    print(f"{'batch':>6} {'args GiB':>8} {'temp GiB':>8} {'peak GiB':>8}  fits")
    rows = []
    for b in (int(x) for x in args.batches.split(",") if x.strip()):
        row = plan_memory(cfg, b)
        rows.append(row)
        fits = ("yes" if limit and row["peak"] <= args.frac * limit
                else ("NO" if limit else "?"))
        print(f"{b:>6} {_fmt(row['arguments'])} {_fmt(row['temp'])} "
              f"{_fmt(row['peak'])}  {fits}")
        if limit and row["peak"] > limit:
            break  # larger candidates only get worse
    if limit:
        best = recommend(rows, limit, args.frac)
        if best is None:
            print("no analyzed batch fits — try smaller candidates, "
                  "remat_policy, fsdp, or a smaller input_size")
        else:
            print(f"recommended per-chip batch: {best}")


if __name__ == "__main__":
    main()
