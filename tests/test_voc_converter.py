"""VOC->YOLO converter test on a synthesized VOCdevkit tree."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from voc_to_yolo import VOC_CLASSES, convert, parse_voc_xml  # noqa: E402

XML_TEMPLATE = """<annotation>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>
"""
OBJ_TEMPLATE = """<object>
    <name>{name}</name><difficult>{difficult}</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>"""


def _make_devkit(root, year, ids):
    import cv2

    for sub in ("JPEGImages", "Annotations", "ImageSets/Main"):
        os.makedirs(os.path.join(root, f"VOC{year}", sub), exist_ok=True)
    rng = np.random.default_rng(0)
    for image_id in ids:
        img = rng.integers(0, 255, (100, 200, 3)).astype(np.uint8)
        cv2.imwrite(os.path.join(root, f"VOC{year}", "JPEGImages",
                                 f"{image_id}.jpg"), img)
        objs = OBJ_TEMPLATE.format(name="dog", difficult=0,
                                   x1=20, y1=10, x2=120, y2=60)
        objs += OBJ_TEMPLATE.format(name="person", difficult=1,
                                    x1=50, y1=50, x2=90, y2=90)
        with open(os.path.join(root, f"VOC{year}", "Annotations",
                               f"{image_id}.xml"), "w") as f:
            f.write(XML_TEMPLATE.format(w=200, h=100, objects=objs))


def test_parse_and_convert(tmp_path):
    devkit = str(tmp_path / "VOCdevkit")
    _make_devkit(devkit, "2007", ["000001", "000002", "000003"])
    with open(os.path.join(devkit, "VOC2007", "ImageSets", "Main",
                           "train.txt"), "w") as f:
        f.write("000001\n000002\n")
    with open(os.path.join(devkit, "VOC2007", "ImageSets", "Main",
                           "val.txt"), "w") as f:
        f.write("000003\n")

    out = convert(devkit, str(tmp_path / "yolo"),
                  train_splits=(("2007", "train"),),
                  val_splits=(("2007", "val"),), copy=True)
    assert out["n_train"] == 2 and out["n_val"] == 1
    with open(out["train_list"]) as f:
        paths = [l for l in f.read().splitlines() if l]
    assert len(paths) == 2

    # labels: dog kept, difficult person dropped
    label = paths[0][:-4] + ".txt"
    rows = open(label).read().splitlines()
    assert len(rows) == 1
    cid, cx, cy, w, h = map(float, rows[0].split())
    assert int(cid) == VOC_CLASSES.index("dog")
    assert cx == pytest.approx((20 + 120) / 2 / 200, abs=1e-5)
    assert h == pytest.approx(50 / 100, abs=1e-5)

    # the converted tree feeds the framework dataset directly
    from podtpu.data.dataset import YoloTxtDataset

    ds = YoloTxtDataset(out["train_list"], 128, augment=False)
    img, boxes = ds.get(0, seed=0)
    assert img.shape == (128, 128, 3)
    assert len(boxes) == 1 and int(boxes[0, 4]) == VOC_CLASSES.index("dog")
