"""Convert VOCdevkit (Pascal VOC XML) to the YOLO-txt layout the framework
consumes (and the reference assumed pre-converted: README.md:43-50 trains on
"voc/yolo_format" lists).

Produces, under --out:
  images/<id>.jpg symlinks (or copies with --copy), sibling <id>.txt labels
  (``cid cx cy w h`` normalized), train.txt / val.txt list files, voc.names.

The reference recipe's split: train = VOC2007 train + VOC2012 trainval,
val = VOC2007 val.

    python tools/voc_to_yolo.py --devkit /data/VOCdevkit --out /data/voc/yolo_format
"""

from __future__ import annotations

import argparse
import os
import shutil
import xml.etree.ElementTree as ET

VOC_CLASSES = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]


def parse_voc_xml(xml_path: str, class_to_id: dict,
                  keep_difficult: bool = False):
    """[(cid, cx, cy, w, h) normalized] from one annotation file."""
    root = ET.parse(xml_path).getroot()
    size = root.find("size")
    width = float(size.find("width").text)
    height = float(size.find("height").text)
    rows = []
    for obj in root.findall("object"):
        name = obj.find("name").text.strip()
        if name not in class_to_id:
            continue
        difficult = obj.find("difficult")
        if not keep_difficult and difficult is not None and \
                difficult.text.strip() == "1":
            continue
        box = obj.find("bndbox")
        x1 = float(box.find("xmin").text)
        y1 = float(box.find("ymin").text)
        x2 = float(box.find("xmax").text)
        y2 = float(box.find("ymax").text)
        rows.append((
            class_to_id[name],
            (x1 + x2) / 2.0 / width,
            (y1 + y2) / 2.0 / height,
            (x2 - x1) / width,
            (y2 - y1) / height,
        ))
    return rows


def read_split_ids(devkit: str, year: str, split: str) -> list[str]:
    path = os.path.join(devkit, f"VOC{year}", "ImageSets", "Main",
                        f"{split}.txt")
    with open(path, "r") as f:
        return [line.strip() for line in f if line.strip()]


def convert(devkit: str, out_dir: str,
            train_splits=(("2007", "train"), ("2012", "trainval")),
            val_splits=(("2007", "val"),),
            copy: bool = False, keep_difficult: bool = False) -> dict:
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    class_to_id = {n: i for i, n in enumerate(VOC_CLASSES)}

    def handle(year: str, image_id: str) -> str | None:
        src_img = os.path.join(devkit, f"VOC{year}", "JPEGImages",
                               f"{image_id}.jpg")
        src_xml = os.path.join(devkit, f"VOC{year}", "Annotations",
                               f"{image_id}.xml")
        if not (os.path.exists(src_img) and os.path.exists(src_xml)):
            return None
        dst_img = os.path.join(img_dir, f"{year}_{image_id}.jpg")
        if not os.path.exists(dst_img):
            if copy:
                shutil.copyfile(src_img, dst_img)
            else:
                os.symlink(os.path.abspath(src_img), dst_img)
        rows = parse_voc_xml(src_xml, class_to_id, keep_difficult)
        with open(dst_img[:-4] + ".txt", "w") as f:
            for cid, cx, cy, w, h in rows:
                f.write(f"{cid} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}\n")
        return dst_img

    out = {}
    for name, splits in (("train", train_splits), ("val", val_splits)):
        paths = []
        for year, split in splits:
            for image_id in read_split_ids(devkit, year, split):
                p = handle(year, image_id)
                if p:
                    paths.append(p)
        list_path = os.path.join(out_dir, f"{name}.txt")
        with open(list_path, "w") as f:
            f.write("\n".join(paths) + "\n")
        out[f"{name}_list"] = list_path
        out[f"n_{name}"] = len(paths)

    names_path = os.path.join(out_dir, "voc.names")
    with open(names_path, "w") as f:
        f.write("\n".join(VOC_CLASSES) + "\n")
    out["names"] = names_path
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devkit", required=True, help="path to VOCdevkit")
    ap.add_argument("--out", required=True)
    ap.add_argument("--copy", action="store_true",
                    help="copy images instead of symlinking")
    ap.add_argument("--keep-difficult", action="store_true")
    args = ap.parse_args()
    info = convert(args.devkit, args.out, copy=args.copy,
                   keep_difficult=args.keep_difficult)
    print(info)


if __name__ == "__main__":
    main()
