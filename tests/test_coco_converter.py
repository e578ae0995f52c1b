"""COCO->YOLO converter test on a synthesized COCO dataset (companion to
test_voc_converter.py; covers the reference's coco-person recipe ingest)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from coco_to_yolo import convert  # noqa: E402


def _make_coco(tmp_path, n_images=3):
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(n_images):
        name = f"img_{i:04d}.jpg"
        cv2.imwrite(str(img_dir / name),
                    rng.integers(0, 255, (100, 200, 3)).astype(np.uint8))
        images.append({"id": 10 + i, "file_name": name,
                       "width": 200, "height": 100})
        # sparse COCO category ids: person=1, car=3
        annotations.append({"id": 100 + i, "image_id": 10 + i,
                            "category_id": 1, "bbox": [20, 10, 100, 50],
                            "iscrowd": 0, "area": 5000})
        annotations.append({"id": 200 + i, "image_id": 10 + i,
                            "category_id": 3, "bbox": [50, 50, 40, 40],
                            "iscrowd": 0, "area": 1600})
        annotations.append({"id": 300 + i, "image_id": 10 + i,
                            "category_id": 1, "bbox": [0, 0, 30, 30],
                            "iscrowd": 1, "area": 900})  # crowd: dropped
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}, {"id": 3, "name": "car"}],
    }
    ann_path = tmp_path / "instances.json"
    ann_path.write_text(json.dumps(ann))
    return str(ann_path), str(img_dir)


def test_convert_all_classes(tmp_path):
    ann, img_dir = _make_coco(tmp_path)
    out = convert(ann, img_dir, str(tmp_path / "yolo"), split="train",
                  copy=True)
    assert out["n_train"] == 3 and out["num_classes"] == 2
    with open(out["train_list"]) as f:
        paths = [l for l in f.read().splitlines() if l]
    rows = open(paths[0][:-4] + ".txt").read().splitlines()
    assert len(rows) == 2  # crowd dropped
    cid, cx, cy, w, h = map(float, rows[0].split())
    assert int(cid) == 0  # person -> dense id 0
    assert cx == pytest.approx((20 + 100 / 2) / 200, abs=1e-5)
    assert h == pytest.approx(50 / 100, abs=1e-5)
    names = open(out["names"]).read().split()
    assert names == ["person", "car"]

    # feeds the framework dataset directly
    from podtpu.data.dataset import YoloTxtDataset

    ds = YoloTxtDataset(out["train_list"], 128, augment=False)
    img, boxes = ds.get(0, seed=0)
    assert img.shape == (128, 128, 3)
    assert len(boxes) == 2


def test_basename_collision_keeps_label_image_pairing(tmp_path):
    """file_names that collide on basename ('cam1/1.jpg' vs 'cam2/1.jpg')
    must not pair one image with the other's labels."""
    import cv2

    img_dir = tmp_path / "imgs"
    (img_dir / "cam1").mkdir(parents=True)
    (img_dir / "cam2").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for cam in ("cam1", "cam2"):
        cv2.imwrite(str(img_dir / cam / "1.jpg"),
                    rng.integers(0, 255, (100, 200, 3)).astype(np.uint8))
    ann = {
        "images": [
            {"id": 1, "file_name": "cam1/1.jpg", "width": 200, "height": 100},
            {"id": 2, "file_name": "cam2/1.jpg", "width": 200, "height": 100},
        ],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [0, 0, 50, 50], "iscrowd": 0, "area": 2500},
            {"id": 2, "image_id": 2, "category_id": 1,
             "bbox": [100, 50, 50, 50], "iscrowd": 0, "area": 2500},
        ],
        "categories": [{"id": 1, "name": "person"}],
    }
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    out = convert(str(ann_path), str(img_dir), str(tmp_path / "yolo"),
                  split="train", copy=True)
    assert out["n_train"] == 2
    with open(out["train_list"]) as f:
        paths = [l for l in f.read().splitlines() if l]
    assert len(set(paths)) == 2  # two distinct files, no overwrite
    labels = sorted(open(p[:-4] + ".txt").read().strip() for p in paths)
    assert labels[0] != labels[1]  # each image kept its own annotation


def test_convert_class_subset(tmp_path):
    ann, img_dir = _make_coco(tmp_path)
    out = convert(ann, img_dir, str(tmp_path / "yolo_person"), split="val",
                  classes=["person"], copy=True)
    assert out["num_classes"] == 1
    with open(out["val_list"]) as f:
        paths = [l for l in f.read().splitlines() if l]
    for p in paths:
        for row in open(p[:-4] + ".txt").read().splitlines():
            assert row.split()[0] == "0"

    with pytest.raises(SystemExit):
        convert(ann, img_dir, str(tmp_path / "x"), classes=["zebra"])
