"""VOCdevkit -> YOLO-txt conversion locked against a fabricated devkit.

tools/make_fake_vocdevkit.py emits the exact Pascal layout the reference
recipe consumed (VOC2007 train/val + VOC2012 trainval, XML annotations,
ImageSets splits); tools/voc_to_yolo.py must reproduce the reference's
split composition (train = 07train + 12trainval, val = 07val;
README.md:43-50) and drop ``difficult`` objects like the torch pipelines.
This is the entry leg of tools/run_voc_parity.sh, rehearsed end-to-end in
RESULTS.md round-11.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from make_fake_vocdevkit import fabricate  # noqa: E402
from voc_to_yolo import VOC_CLASSES, convert, parse_voc_xml  # noqa: E402


@pytest.fixture(scope="module")
def devkit(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("devkit"))
    fabricate(out, n_2007_train=5, n_2007_val=3, n_2012=4, size=128, seed=3)
    return out


def test_devkit_layout(devkit):
    for year, split, n in (("2007", "train", 5), ("2007", "val", 3),
                           ("2012", "trainval", 4)):
        ids = open(os.path.join(devkit, f"VOC{year}", "ImageSets", "Main",
                                f"{split}.txt")).read().split()
        assert len(ids) == n
        for i in ids:
            root = os.path.join(devkit, f"VOC{year}")
            assert os.path.exists(
                os.path.join(root, "JPEGImages", f"{i}.jpg"))
            assert os.path.exists(
                os.path.join(root, "Annotations", f"{i}.xml"))


def test_convert_reference_split(devkit, tmp_path):
    info = convert(devkit, str(tmp_path / "yolo"), copy=True)
    # reference split composition: train = 07train + 12trainval, val = 07val
    assert info["n_train"] == 5 + 4
    assert info["n_val"] == 3
    names = open(info["names"]).read().split()
    assert names == VOC_CLASSES

    train = open(info["train_list"]).read().split()
    assert len(train) == 9
    for p in train:
        assert os.path.exists(p)
        label = os.path.splitext(p)[0] + ".txt"
        rows = np.loadtxt(label, ndmin=2)
        if rows.size == 0:
            continue
        assert rows.shape[1] == 5
        assert (rows[:, 0] >= 0).all() and (rows[:, 0] < 20).all()
        # normalized cxcywh, inside the unit square
        assert (rows[:, 1:] > 0).all() and (rows[:, 1:] <= 1).all()


def test_difficult_objects_filtered(devkit, tmp_path):
    class_to_id = {n: i for i, n in enumerate(VOC_CLASSES)}
    xmls, kept, total = [], 0, 0
    for year in ("2007", "2012"):
        d = os.path.join(devkit, f"VOC{year}", "Annotations")
        xmls += [os.path.join(d, f) for f in os.listdir(d)]
    for x in xmls:
        kept += len(parse_voc_xml(x, class_to_id))
        total += len(parse_voc_xml(x, class_to_id, keep_difficult=True))
    assert total > 0
    assert kept <= total  # difficult rows are dropped by default
    # the fabricator seeds ~10% difficult; with 12+ images some must exist
    assert kept < total, "fabricated devkit contains no difficult objects"
