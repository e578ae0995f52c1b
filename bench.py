"""Benchmark: YOLOv3-darknet19 @416 training throughput (images/sec/chip).

Runs the full jitted training step (forward + vectorized target encoding +
CIoU loss + backward + SGD update, bf16 compute) on the attached TPU chip
with device-resident synthetic batches, so the number is the compute-path
ceiling the input pipeline must feed. The harness itself lives in
tools/bench_family.py (shared with the per-family probe so the two tools
stay methodology-identical).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers
(BASELINE.json.published == {}). We use REF_GPU_IPS = 130 images/sec as the
estimated reference training throughput on its single unspecified GPU — a
YOLOv3-darknet19@416 torch fwd+bwd at batch 64 is ~150-200 img/s on a
2080Ti-class card, and the reference's per-step CPU Python target-encoding
loop (SURVEY.md §3.1) drags it below that. vs_baseline = value / REF_GPU_IPS.

The baseline is an ESTIMATE (no GPU in this environment to measure the
reference), so vs_baseline carries roughly a 0.5-2x band; the absolute
images/sec/chip and the roofline position (RESULTS.md "Round-2 MFU attack":
495 GB/s effective of 819 peak, bandwidth-bound, pure-BW floor ~1540 img/s)
are the hard numbers. Run-to-run variance over the axon tunnel is ~±3%.
"""

from __future__ import annotations

import json

REF_GPU_IPS = 130.0
BATCH = 128


def main():
    from __graft_entry__ import _flagship_cfg
    from tools.bench_family import bench

    cfg = _flagship_cfg(input_size=416, compute_dtype="bfloat16")
    ips = bench(cfg, BATCH, warmup=3, iters=10)
    print(json.dumps({
        "metric": "yolov3_416_train_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / REF_GPU_IPS, 3),
    }))


if __name__ == "__main__":
    main()
