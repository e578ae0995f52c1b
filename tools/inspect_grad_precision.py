"""Dump every convolution in the compiled train step with its operand/output
dtypes — ground truth for the "f32 weight-grad convs" roofline entry
(RESULTS.md round-11: ~16 ms/step at 165-440 GB/s attributed to
multiply_add_fusion.79-135) before attempting the bf16 weight-grad lever
(VERDICT r3 item 2).

AOT-only: lowers with ShapeDtypeStructs and compiles (hits the persistent
compilation cache bench.py populates), never executes — safe to run without
claiming the chip.

    python tools/inspect_grad_precision.py [--cfg ...] [--batch 128]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def conv_lines(hlo_text: str) -> list[str]:
    """Every 'convolution' instruction line, whole-module (incl. fusions)."""
    return [ln.strip() for ln in hlo_text.splitlines()
            if re.search(r"=\s*\S+\s+convolution\(", ln)]


def summarize(line: str) -> str:
    m = re.match(r"(%?\S+)\s*=\s*(\S+)\s+convolution\((.*?)\)", line)
    head = f"{m.group(2):<28} <- " if m else line[:60]
    ops = re.findall(r"(?:%|)(\w[\w.\-]*)\.?\d*\s*", m.group(3)) if m else []
    types = re.findall(r"(f32|bf16|s8|s32|f16)\[[\d,]*\]", line)
    dims = re.search(r"dim_labels=(\S+?)[,}]", line)
    window = re.search(r"window=\{(.*?)\}", line)
    meta = re.search(r'metadata=\{op_name="([^"]*)"', line)
    return (f"{head}{types}  dims={dims.group(1) if dims else '?'}  "
            f"window={{{window.group(1) if window else ''}}}\n"
            f"    op_name={meta.group(1) if meta else '?'}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--cfg", type=str, default=None)
    ap.add_argument("--full", action="store_true",
                    help="print raw HLO lines, not summaries")
    args = ap.parse_args()

    from __graft_entry__ import _flagship_cfg
    from podtpu.parallel.mesh import make_mesh
    from podtpu.train.state import create_train_state
    from podtpu.train.steps import make_train_step

    if args.cfg:
        from podtpu.config import get_configs

        cfg = get_configs(args.cfg)
        cfg["compute_dtype"] = "bfloat16"
    else:
        cfg = _flagship_cfg(input_size=416, compute_dtype="bfloat16")

    mesh = make_mesh()
    step = make_train_step(cfg, mesh, donate=True)

    # abstract lowering: no arrays ever touch the device
    state_shape = jax.eval_shape(
        lambda r: create_train_state(cfg, r), jax.random.PRNGKey(0))
    size = cfg["input_size"]
    batch_shape = {
        "img": jax.ShapeDtypeStruct((args.batch, size, size, 3), jnp.float32),
        "annot": jax.ShapeDtypeStruct(
            (args.batch, cfg["max_annots"], 5), jnp.float32),
    }
    rng_shape = jax.ShapeDtypeStruct((2,), jnp.uint32)
    compiled = step.lower(state_shape, batch_shape, rng_shape).compile()
    text = compiled.as_text()

    lines = conv_lines(text)
    print(f"{len(lines)} convolution instructions "
          f"(backend {jax.default_backend()}):\n")
    for ln in lines:
        print(ln if args.full else summarize(ln))
        print()


if __name__ == "__main__":
    main()
