"""Convert a COCO detection dataset (instances_*.json + image dir) to the
YOLO-txt layout the framework consumes (companion to tools/voc_to_yolo.py;
the reference's own coco-person recipe trains on pre-converted yolo lists —
configs/yolov4-tiny_coco-person.yaml).

Produces, under --out:
  images/<file> symlinks (or copies with --copy), sibling <file>.txt labels
  (``cid cx cy w h`` normalized), a <split>.txt list file, <name>.names.

Class ids are remapped to a dense 0..C-1 range in COCO category-id order
(COCO ids are sparse: 1..90 with gaps); pass --classes person,car,... to
keep a subset (e.g. --classes person reproduces a coco-person dataset).
Boxes are COCO ``[x, y, w, h]`` absolute pixels; crowd annotations are
dropped unless --keep-crowd.

    python tools/coco_to_yolo.py --ann instances_train2017.json \
        --img-dir /data/coco/train2017 --out /data/coco/yolo --split train
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
from collections import defaultdict


def convert(ann_path: str, img_dir: str, out_dir: str, split: str = "train",
            classes: list[str] | None = None, copy: bool = False,
            keep_crowd: bool = False, names_file: str = "coco.names") -> dict:
    with open(ann_path, "r") as f:
        coco = json.load(f)

    cats = sorted(coco["categories"], key=lambda c: c["id"])
    if classes:
        want = set(classes)
        cats = [c for c in cats if c["name"] in want]
        missing = want - {c["name"] for c in cats}
        if missing:
            raise SystemExit(f"classes not in {ann_path}: {sorted(missing)}")
    cat_to_cid = {c["id"]: i for i, c in enumerate(cats)}

    images = {im["id"]: im for im in coco["images"]}
    by_image: dict[int, list] = defaultdict(list)
    for a in coco.get("annotations", []):
        if a["category_id"] not in cat_to_cid:
            continue
        if a.get("iscrowd", 0) and not keep_crowd:
            continue
        by_image[a["image_id"]].append(a)

    out_img_dir = os.path.join(out_dir, "images")
    os.makedirs(out_img_dir, exist_ok=True)
    paths = []
    used: dict[str, int] = {}
    for image_id, im in images.items():
        src = os.path.join(img_dir, im["file_name"])
        if not os.path.exists(src):
            continue
        # flatten subdirectories into the name; COCO file_names may collide
        # on basename ('cam1/0001.jpg' vs 'cam2/0001.jpg') — namespace by
        # image id on collision so labels never pair with the wrong pixels
        flat = im["file_name"].replace("/", "_").replace(os.sep, "_")
        if used.setdefault(flat, image_id) != image_id:
            root, ext = os.path.splitext(flat)
            flat = f"{root}_{image_id}{ext}"
        dst = os.path.join(out_img_dir, flat)
        if not os.path.exists(dst):
            if copy:
                shutil.copyfile(src, dst)
            else:
                os.symlink(os.path.abspath(src), dst)
        width = float(im["width"])
        height = float(im["height"])
        rows = []
        for a in by_image.get(image_id, []):
            x, y, w, h = a["bbox"]
            # clip to the image the way a normalized label must be
            x1 = min(max(x, 0.0), width)
            y1 = min(max(y, 0.0), height)
            x2 = min(max(x + w, 0.0), width)
            y2 = min(max(y + h, 0.0), height)
            if x2 <= x1 or y2 <= y1:
                continue
            rows.append((
                cat_to_cid[a["category_id"]],
                (x1 + x2) / 2.0 / width,
                (y1 + y2) / 2.0 / height,
                (x2 - x1) / width,
                (y2 - y1) / height,
            ))
        with open(os.path.splitext(dst)[0] + ".txt", "w") as f:
            for cid, cx, cy, w, h in rows:
                f.write(f"{cid} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}\n")
        paths.append(dst)

    list_path = os.path.join(out_dir, f"{split}.txt")
    with open(list_path, "w") as f:
        f.write("\n".join(paths) + "\n")
    names_path = os.path.join(out_dir, names_file)
    with open(names_path, "w") as f:
        f.write("\n".join(c["name"] for c in cats) + "\n")
    return {
        f"{split}_list": list_path,
        f"n_{split}": len(paths),
        "names": names_path,
        "num_classes": len(cats),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ann", required=True, help="instances_*.json")
    ap.add_argument("--img-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--split", default="train", help="list file name")
    ap.add_argument("--classes", default="",
                    help="comma-separated subset, e.g. 'person'")
    ap.add_argument("--copy", action="store_true",
                    help="copy images instead of symlinking")
    ap.add_argument("--keep-crowd", action="store_true")
    args = ap.parse_args()
    classes = [c for c in args.classes.split(",") if c] or None
    info = convert(args.ann, args.img_dir, args.out, split=args.split,
                   classes=classes, copy=args.copy,
                   keep_crowd=args.keep_crowd)
    print(info)


if __name__ == "__main__":
    main()
