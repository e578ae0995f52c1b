"""Calibrate the trajectory-lockstep bounds by mutation.

Runs tests/test_reference_grad_parity._run_trajectory for the clean
configuration and each seeded semantic bug (nesterov off, 10x weight
decay, burn-in off-by-one), printing the drift diagnostics side by side.
The test's bounds must sit between the clean row and every mutated row —
that is the evidence that the lockstep test detects real optimizer-recipe
bugs rather than merely tolerating f32 chaos.

    python tools/traj_calibrate.py [--model yolov2] [--mutations all|none]

CPU-only (forces jax_platforms=cpu); ~2 min per row.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov2")
    ap.add_argument("--mutations", default="all",
                    help="'all', 'none', or comma-separated names")
    args = ap.parse_args()

    from tests.test_reference_grad_parity import _run_trajectory

    if args.mutations == "all":
        rows = [None, "no_nesterov", "wd_x10", "sched_off1"]
    elif args.mutations == "none":
        rows = [None]
    else:
        rows = [m or None for m in args.mutations.split(",")]

    out = {}
    for mutate in rows:
        d = _run_trajectory(args.model, mutate=mutate)
        label = mutate or "clean"
        out[label] = s = {
            "max_loss_rel": max(d["loss_rel"]),
            "max_kern_rel": max(d["kern_rel"]),
            "max_other_rel": max(d["other_rel"]),
            "min_upd_cos": min(d["upd_cos"]),
            "max_bn_rel": max(d["bn_rel"]),
            "kern_key": d["kern_key"], "other_key": d["other_key"],
            "cos_key": d["cos_key"], "bn_key": d["bn_key"],
        }
        print(f"[{label:12s}] max_loss_rel={s['max_loss_rel']:.2e} "
              f"max_kern_rel={s['max_kern_rel']:.2e} ({s['kern_key']}) "
              f"max_other_rel={s['max_other_rel']:.2e} ({s['other_key']}) "
              f"min_upd_cos={s['min_upd_cos']:.6f} "
              f"max_bn_rel={s['max_bn_rel']:.2e} ({s['bn_key']})",
              flush=True)
        print("  per-step kern_rel:",
              " ".join(f"{r:.1e}" for r in d["kern_rel"]), flush=True)
    print("TRAJ-CAL", json.dumps(out))


if __name__ == "__main__":
    main()
