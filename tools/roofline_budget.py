"""Close the HBM traffic budget op-by-op (VERDICT r2 item 5).

Joins three views of the SAME batch-128 train step:

1. ``compiled.cost_analysis()`` — XLA's aggregate FLOPs + bytes accessed;
2. the optimized HLO entry computation — per top-level instruction, the
   bytes it moves through HBM (operand + output buffer sizes; fusion
   internals stay in registers/VMEM so entry granularity IS the HBM view);
3. an xprof trace — per-op device self-times.

The join prints, for every op with self-time >= ``--min-ms``, its bytes,
achieved GB/s, and % of HBM peak — so the gap between the step's effective
bandwidth and the 819 GB/s roofline is attributed to specific ops (MXU
compute-bound convs running above BW, latency-bound whiles below it)
instead of an unexplained 40%.

CAVEAT: entry-granularity traffic counts an operand once PER CONSUMER, so
it upper-bounds true HBM bytes — graphs with heavy buffer reuse (the CSP
concat routes in yolov4-tiny) can show >100% "of peak" per op; read those
as "this op re-reads shared buffers", and cross-check the aggregate
against cost_analysis's bytes-accessed. Also compare device op time to
the bench wall: yolov4-tiny measured 44.6 ms device vs 59.5 ms wall —
the ~15 ms/step gap is tunnel dispatch, not chip time.

    python tools/roofline_budget.py [--batch 128] [--iters 5]

Run on the TPU only (never concurrently with bench.py).
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import jax  # noqa: E402
import numpy as np  # noqa: E402

HBM_PEAK_GBS = 819.0  # v5e
_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
                "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
                "f64": 8, "c64": 8, "c128": 16, "token": 0, "opaque": 0}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(type_str: str) -> int:
    """Total bytes of an HLO type string (handles tuples)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(type_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def entry_traffic(hlo_text: str) -> dict[str, int]:
    """{instruction name: operand+output bytes} for the ENTRY computation.

    Entry-level operands/outputs are HBM buffers; everything inside a
    fusion is fused away. Operand bytes come from the definitions table so
    aliased/donated buffers still count one read + one write.
    """
    m = re.search(r"^ENTRY \S+ .*?\{$(.*?)^\}", hlo_text,
                  re.MULTILINE | re.DOTALL)
    if not m:
        raise ValueError("no ENTRY computation found")
    body = m.group(1)
    defs: dict[str, str] = {}
    lines = []
    for raw in body.splitlines():
        line = raw.strip()
        # tuple types carry one level of nested parens in their layouts
        # (e.g. {0:T(1024)(128)(2,1)S(1)}) — allow it
        mm = re.match(
            r"(?:ROOT )?%?([\w.\-]+) = "
            r"(\((?:[^()]|\([^()]*\))*\)|\S+?\[[^\]]*\]\S*)\s+([\w\-]+)",
            line)
        if not mm:
            continue
        name, type_str, opcode = mm.groups()
        defs[name] = type_str
        lines.append((name, type_str, opcode, line))
    traffic = {}
    for name, type_str, opcode, line in lines:
        if opcode in ("parameter", "constant", "get-tuple-element", "tuple",
                      "bitcast"):
            continue
        out_b = shape_bytes(type_str)
        # operand names: %foo refs inside the operand parens
        call = line.split(opcode, 1)[1]
        call = call.split("calls=")[0].split("to_apply=")[0]
        in_b = sum(shape_bytes(defs.get(op, ""))
                   for op in re.findall(r"%([\w.\-]+)", call))
        traffic[name] = in_b + out_b
    return traffic


def top_ops_by_line(trace_dir: str):
    """Like profile_step.top_ops, but prints per-plane/line totals first and
    sums ONE "XLA Ops" line per device plane (a trace can carry several
    op-granularity lines whose naive union double-counts device time)."""
    import collections
    import glob

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return None, []
    data = jax.profiler.ProfileData.from_file(paths[0])
    totals: dict = collections.Counter()
    device_total = 0.0
    for plane in data.planes:
        if "TPU" not in plane.name and "/device" not in plane.name.lower():
            continue
        line_sums = []
        for line in plane.lines:
            s = sum(ev.duration_ns for ev in line.events)
            line_sums.append((line.name, len(list(line.events)), s))
        for name, n, s in sorted(line_sums, key=lambda t: -t[2])[:8]:
            print(f"  plane '{plane.name}' line '{name}': {n} events, "
                  f"{s / 1e6:.1f} ms total")
        # one op line per plane: the busiest SYNC "XLA Ops" line ("Async
        # XLA Ops" holds overlapping in-flight windows, not self-time)
        xla = [t for t in line_sums
               if "XLA Ops" in t[0] and "Async" not in t[0]]
        if not xla:
            continue
        best = max(xla, key=lambda t: t[2])
        for line in plane.lines:
            if line.name != best[0]:
                continue
            for ev in line.events:
                totals[ev.name] += ev.duration_ns
                device_total += ev.duration_ns
            break
    return device_total, totals.most_common(2000)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--min-ms", type=float, default=0.25)
    ap.add_argument("--trace-dir", type=str, default="/tmp/podtpu_roofline")
    ap.add_argument("--cfg", type=str, default=None,
                    help="config yaml (default: the yolov3 flagship)")
    args = ap.parse_args()

    from profile_step import make_inputs

    from __graft_entry__ import _flagship_cfg
    from podtpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
    from podtpu.train.state import create_train_state
    from podtpu.train.steps import make_train_step

    if args.cfg:
        from podtpu.config import get_configs

        cfg = get_configs(args.cfg)
        cfg["compute_dtype"] = "bfloat16"
    else:
        cfg = _flagship_cfg(input_size=416, compute_dtype="bfloat16")
    mesh = make_mesh()
    state = jax.device_put(create_train_state(cfg, jax.random.PRNGKey(0)),
                           replicated_sharding(mesh))
    # donate=True is the production configuration (bench.py): without it
    # every param/momentum leaf is copied each step — a first run of this
    # tool with donate=False measured 275 ms wall and ~81 GB entry traffic,
    # all of it copy-start/copy-done pairs that don't exist in the real step
    step = make_train_step(cfg, mesh, donate=True)
    batch = shard_batch(make_inputs(cfg, args.batch), mesh)
    rng = jax.random.PRNGKey(0)

    lowered = step.lower(state, batch, rng)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    bytes_claimed = float(cost.get("bytes accessed", 0.0))
    traffic = entry_traffic(compiled.as_text())
    entry_total = sum(traffic.values())
    print(f"cost_analysis: {flops / 1e12:.2f} TFLOP, "
          f"{bytes_claimed / 1e9:.2f} GB accessed")
    print(f"entry-granularity traffic (operands+outputs): "
          f"{entry_total / 1e9:.2f} GB over {len(traffic)} ops")

    for _ in range(3):
        state, m = step(state, batch, rng)
    jax.device_get(np.asarray(m["loss"]))
    # a stale .xplane.pb from a previous run would be globbed instead of
    # this run's trace (observed: identical op table across code changes)
    import shutil

    shutil.rmtree(args.trace_dir, ignore_errors=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            state, m = step(state, batch, rng)
        jax.device_get(np.asarray(m["loss"]))
    wall = (time.perf_counter() - t0) / args.iters
    print(f"step {wall * 1000:.1f} ms -> {args.batch / wall:.1f} img/s")

    device_total, tops = top_ops_by_line(args.trace_dir)
    if device_total is None:
        print("no xplane captured")
        return
    dev_ms = device_total / 1e6 / args.iters
    print(f"device op time: {dev_ms:.2f} ms/step")

    rows, matched_b, matched_ms = [], 0.0, 0.0
    for name, ns in tops:
        ms = ns / 1e6 / args.iters
        # event names are full HLO definition lines; the key is the lhs
        key = name.split(" = ")[0].strip().lstrip("%")
        b = traffic.get(key)
        if b is not None:
            matched_b += b
            matched_ms += ms
        if ms < args.min_ms:
            continue
        gbs = (b / 1e9) / (ms / 1e3) if b else None
        rows.append((ms, name, b, gbs))
    print(f"\nmatched {matched_b / 1e9:.2f} GB / {matched_ms:.1f} ms to "
          f"profiled ops")
    print(f"{'ms':>7} {'GB':>7} {'GB/s':>7} {'%peak':>6}  op")
    for ms, name, b, gbs in rows:
        print(f"{ms:7.3f} {b / 1e9 if b else 0:7.3f} "
              f"{gbs or 0:7.0f} {100 * (gbs or 0) / HBM_PEAK_GBS:6.1f}  "
              f"{name[:90]}")
    ideal_ms = entry_total / 1e9 / HBM_PEAK_GBS * 1e3
    # traced WALL carries tunnel/profiler overhead (~2x); device op time is
    # the denominator that matches bench.py's untraced step
    print(f"\npure-BW floor at entry traffic: {ideal_ms:.1f} ms "
          f"({args.batch / ideal_ms * 1000:.0f} img/s); "
          f"effective {matched_b / 1e9 / (dev_ms / 1e3):.0f} GB/s over "
          f"device op time = "
          f"{100 * matched_b / 1e9 / (dev_ms / 1e3) / HBM_PEAK_GBS:.1f}% "
          f"of peak")


if __name__ == "__main__":
    main()
