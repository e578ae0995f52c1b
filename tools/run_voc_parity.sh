#!/usr/bin/env bash
# One-command VOC mAP parity run (VERDICT r1 item 3 / BASELINE.md targets).
#
# From a raw VOCdevkit directory, unattended:
#   1. convert to the YOLO-txt layout the recipes consume;
#   2. train the yolov2 recipe (51.56% target) and the yolov3 recipe
#      (56.02% target) with their published configs;
#   3. evaluate the best checkpoint of each and print both mAP@.5 numbers.
#
# Usage:
#   tools/run_voc_parity.sh /path/to/VOCdevkit [work_dir]
#
# Notes: this is the full recipe (365/300 epochs, early stopping patience 30,
# yolo_lr burn-in 1000 + 0.1 decay at 40k steps) — expect a multi-day run on
# one chip. The cadence itself is rehearsed at 1/10 scale by
# tools/voc_rehearsal.py on synthetic VOC-shaped data (RESULTS.md).
set -euo pipefail

DEVKIT=${1:?usage: run_voc_parity.sh /path/to/VOCdevkit [work_dir]}
WORK=${2:-./voc_parity_work}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DATA="$WORK/yolo_format"
mkdir -p "$WORK"

echo "== 1/3 converting VOC -> YOLO layout =="
python "$REPO/tools/voc_to_yolo.py" --devkit "$DEVKIT" --out "$DATA"

run_one() {
  local model=$1 target=$2
  local cfg="$WORK/${model}_voc.yaml"
  python - "$REPO/configs/${model}_voc.yaml" "$cfg" "$DATA" "$WORK" <<'EOF'
import sys, yaml
src, dst, data, work = sys.argv[1:5]
cfg = yaml.safe_load(open(src))
cfg["train_list"] = f"{data}/train.txt"
cfg["val_list"] = f"{data}/val.txt"
cfg["names"] = f"{data}/voc.names"
cfg["save_dir"] = f"{work}/saved"
cfg["cache_images"] = True
yaml.safe_dump(cfg, open(dst, "w"))
EOF
  echo "== training $model (target mAP@.5 $target) =="
  python "$REPO/train.py" --cfg "$cfg"
  local run_dir
  run_dir=$(ls -d "$WORK/saved/${model}_voc/version_"* | sort -V | tail -1)
  echo "== evaluating $model best checkpoint =="
  python "$REPO/test.py" --cfg "$cfg" --ckpt "$run_dir/checkpoints/best"
}

run_one yolov2 51.56
run_one yolov3 56.02
echo "done — compare the two val_mAP lines above against 51.56 / 56.02"
