#!/usr/bin/env bash
# One-command VOC mAP parity run (VERDICT r1 item 3 / BASELINE.md targets).
#
# From a raw VOCdevkit directory, unattended:
#   1. convert to the YOLO-txt layout the recipes consume;
#   2. train the yolov2 recipe (51.56% target) and the yolov3 recipe
#      (56.02% target) with their published configs;
#   3. evaluate the best checkpoint of each (VOC mAP@.5 protocol);
#   4. emit the Cartucho pred-file tree and the COCO-json results +
#      AP@[.5:.95] — the reference's two cross-check paths
#      (README.md:52-60), so every published-number artifact exists.
#
# Usage:
#   tools/run_voc_parity.sh /path/to/VOCdevkit [work_dir]
#
# Env overrides (dress rehearsal — tools/make_fake_vocdevkit.py fabricates
# a devkit; defaults reproduce the FULL published protocol):
#   PARITY_MODELS="yolov2 yolov3"   models to run
#   PARITY_EPOCHS=""                override cfg epochs (e.g. 2)
#   PARITY_BATCH=""                 override cfg batch_size
#   PARITY_PLATFORM=""              pin backend (e.g. cpu)
#   PARITY_DEPLOY_MODELS="yolov3"   models that ALSO run the deployment
#                                   chain (VERDICT r3 item 6): train with
#                                   cfg `ema: true` + `tta: {hflip}` (the
#                                   measured-good deployment knobs), select
#                                   best-by-EMA, export the int8+TTA serving
#                                   artifact, score it via test.py
#                                   --artifact, and assert the artifact mAP
#                                   within PARITY_DEPLOY_TOL (default 0.02)
#                                   of the in-process int8 validate. "" to
#                                   skip.
#
# Notes: the full recipe (365/300 epochs, early stopping patience 30,
# yolo_lr burn-in 1000 + 0.1 decay at 40k steps) is a multi-day run on one
# chip. The training cadence itself is rehearsed at 1/10 scale by
# tools/voc_rehearsal.py (RESULTS.md); the protocol PLUMBING end-to-end is
# rehearsed by this script on a fabricated devkit (RESULTS.md round-11).
set -euo pipefail

DEVKIT=${1:?usage: run_voc_parity.sh /path/to/VOCdevkit [work_dir]}
WORK=${2:-./voc_parity_work}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DATA="$WORK/yolo_format"
MODELS=${PARITY_MODELS:-"yolov2 yolov3"}
DEPLOY_MODELS=${PARITY_DEPLOY_MODELS-"yolov3"}
DEPLOY_TOL=${PARITY_DEPLOY_TOL:-0.02}
PLATFORM_ARGS=()
[ -n "${PARITY_PLATFORM:-}" ] && PLATFORM_ARGS=(--platform "$PARITY_PLATFORM")
mkdir -p "$WORK"

echo "== 1/4 converting VOC -> YOLO layout =="
python "$REPO/tools/voc_to_yolo.py" --devkit "$DEVKIT" --out "$DATA" --copy

echo "== 1b/4 building the COCO-protocol gt json from the val list =="
python - "$DATA/val.txt" "$DATA/voc.names" "$WORK/val_coco.json" <<'EOF'
import json, os, sys
import cv2
val_list, names_path, out = sys.argv[1:4]
names = [line.strip() for line in open(names_path) if line.strip()]
images, annotations, aid = [], [], 1
for i, line in enumerate(open(val_list)):
    p = line.strip()
    if not p:
        continue
    h, w = cv2.imread(p).shape[:2]
    # absolute file_name: the converter resolves names relative to the
    # json's own directory (COCO convention), but this json lives in the
    # work dir while images stay under yolo_format/images
    images.append({"id": i + 1, "file_name": os.path.abspath(p),
                   "width": w, "height": h})
    label = os.path.splitext(p)[0] + ".txt"
    if os.path.exists(label):
        for row in open(label):
            cid, cx, cy, bw, bh = (float(v) for v in row.split())
            annotations.append({
                "id": aid, "image_id": i + 1, "category_id": int(cid) + 1,
                "bbox": [round((cx - bw / 2) * w, 2),
                         round((cy - bh / 2) * h, 2),
                         round(bw * w, 2), round(bh * h, 2)],
                "area": round(bw * w * bh * h, 2), "iscrowd": 0})
            aid += 1
json.dump({"images": images, "annotations": annotations,
           "categories": [{"id": c + 1, "name": n}
                          for c, n in enumerate(names)]}, open(out, "w"))
print(f"{out}: {len(images)} images, {len(annotations)} boxes")
EOF

run_one() {
  local model=$1 target=$2
  local deploy=0
  case " $DEPLOY_MODELS " in *" $model "*) deploy=1 ;; esac
  local cfg="$WORK/${model}_voc.yaml"
  PARITY_DEPLOY_THIS=$deploy \
  python - "$REPO/configs/${model}_voc.yaml" "$cfg" "$DATA" "$WORK" <<'EOF'
import os, sys, yaml
src, dst, data, work = sys.argv[1:5]
cfg = yaml.safe_load(open(src))
cfg["train_list"] = f"{data}/train.txt"
cfg["val_list"] = f"{data}/val.txt"
cfg["names"] = f"{data}/voc.names"
cfg["save_dir"] = f"{work}/saved"
cfg["cache_images"] = True
if os.environ.get("PARITY_BATCH"):
    cfg["batch_size"] = int(os.environ["PARITY_BATCH"])
if os.environ.get("PARITY_DEPLOY_THIS") == "1":
    # the measured-good deployment knobs (RESULTS.md round-11): EMA shadow
    # trained + used for best-selection; hflip TTA and multi-label NMS
    # (+0.49pt measured) at eval/serving
    cfg["ema"] = True
    cfg["tta"] = {"hflip": True}
    cfg["nms_options"] = {"multi_label": True}
yaml.safe_dump(cfg, open(dst, "w"))
EOF
  echo "== 2/4 training $model (target mAP@.5 $target) =="
  local epochs_args=()
  [ -n "${PARITY_EPOCHS:-}" ] && epochs_args=(--epochs "$PARITY_EPOCHS")
  python "$REPO/train.py" --cfg "$cfg" "${epochs_args[@]}" \
      "${PLATFORM_ARGS[@]}"
  local run_dir
  run_dir=$(ls -d "$WORK/saved/${model}_voc/version_"* | sort -V | tail -1)
  local ckpt="$run_dir/checkpoints/best"
  # a run shorter than the val cadence (epochs < val_every) never selects a
  # 'best'; score the final weights instead so short rehearsals complete
  [ -e "$ckpt" ] || [ -e "$ckpt.staging" ] || ckpt="$run_dir/checkpoints/last"
  echo "== 3/4 evaluating $model best checkpoint (VOC mAP@.5) =="
  python "$REPO/test.py" --cfg "$cfg" --ckpt "$ckpt" "${PLATFORM_ARGS[@]}"
  echo "== 4/4 $model pred-file tree + COCO results json =="
  python "$REPO/make_pred_file.py" --cfg "$cfg" --ckpt "$ckpt" \
      --out "$WORK/${model}_preds" "${PLATFORM_ARGS[@]}"
  python "$REPO/yolo2coco_pred_file.py" --cfg "$cfg" --ckpt "$ckpt" \
      --json "$WORK/val_coco.json" --out "$WORK/${model}_results.json" \
      "${PLATFORM_ARGS[@]}"
  if [ "$deploy" = 1 ]; then
    echo "== 5/5 $model deployment chain: EMA best -> int8+TTA artifact -> scored =="
    local art="$WORK/${model}_serving.stablehlo"
    local dbatch=${PARITY_BATCH:-8}
    python "$REPO/export_model.py" --cfg "$cfg" --ckpt "$ckpt" \
        --quantize int8 --calib-batches 4 --with-postprocess \
        --batch "$dbatch" --out "$art" "${PLATFORM_ARGS[@]}"
    python "$REPO/test.py" --cfg "$cfg" --artifact "$art" \
        "${PLATFORM_ARGS[@]}" | tee "$WORK/${model}_artifact_eval.log"
    python "$REPO/test.py" --cfg "$cfg" --ckpt "$ckpt" --quantize int8 \
        --calib-batches 4 "${PLATFORM_ARGS[@]}" \
        | tee "$WORK/${model}_int8_eval.log"
    python - "$WORK/${model}_artifact_eval.log" \
        "$WORK/${model}_int8_eval.log" "$DEPLOY_TOL" <<'EOF'
import re, sys
art_log, ref_log, tol = sys.argv[1], sys.argv[2], float(sys.argv[3])
art = float(re.search(r"artifact val_mAP: ([\d.]+)", open(art_log).read())
            .group(1))
ref = float(re.search(r"^val_mAP: ([\d.]+)", open(ref_log).read(),
                      re.MULTILINE).group(1))
print(f"deployment check: artifact {art:.5f} vs in-process int8 {ref:.5f} "
      f"(tol {tol})")
assert abs(art - ref) <= tol, (
    f"artifact mAP {art} deviates from in-process int8 validate {ref} "
    f"by more than {tol}")
EOF
  fi
}

for m in $MODELS; do
  case $m in
    yolov2) run_one yolov2 51.56 ;;
    yolov3) run_one yolov3 56.02 ;;
    *) run_one "$m" "?" ;;
  esac
done
echo "done — compare the val_mAP lines above against the targets; the"
echo "pred-file trees and COCO results json are under $WORK for the"
echo "reference's two cross-check scorers."
