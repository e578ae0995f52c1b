"""COCO-style evaluator + PR-curve/confusion-matrix tests."""

import numpy as np
import pytest

from podtpu.metrics.coco import coco_eval
from podtpu.metrics.curves import ConfusionMatrix, ap_per_class


def test_coco_perfect():
    true = np.array([[0, 50, 50, 20, 20, 1.0, 0]], np.float32)
    pred = np.array([[0, 50, 50, 20, 20, 0.9, 0]], np.float32)
    r = coco_eval(true, pred, 1)
    assert r["AP"] == pytest.approx(1.0, abs=0.02)
    assert r["AP50"] == pytest.approx(1.0, abs=0.02)


def test_coco_loose_box_passes_50_not_75():
    # ~60% IoU box: counts at 0.5, not at 0.75
    true = np.array([[0, 50, 50, 20, 20, 1.0, 0]], np.float32)
    pred = np.array([[0, 54, 50, 20, 20, 0.9, 0]], np.float32)  # IoU ~0.667
    r = coco_eval(true, pred, 1)
    assert r["AP50"] == pytest.approx(1.0, abs=0.02)
    assert r["AP75"] == pytest.approx(0.0, abs=0.02)
    assert 0.0 < r["AP"] < 1.0


def test_coco_matcher_prefers_unmatched_gt():
    """COCO matcher: a det whose best GT is taken can match another GT
    (unlike the VOC-style matcher)."""
    true = np.array([
        [0, 50, 50, 20, 20, 1.0, 0],
        [0, 56, 50, 20, 20, 1.0, 0],  # IoU(det2, GT1) = 15/25 = 0.6
    ], np.float32)
    pred = np.array([
        [0, 50, 50, 20, 20, 0.95, 0],  # takes GT0
        [0, 51, 50, 20, 20, 0.90, 0],  # best is GT0 (taken) but GT1 clears 0.5
    ], np.float32)
    r = coco_eval(true, pred, 1)
    assert r["AP50"] == pytest.approx(1.0, abs=0.02)


def test_ap_per_class_outputs():
    rng = np.random.default_rng(0)
    true = np.zeros((30, 7), np.float32)
    true[:, 0] = rng.integers(0, 10, 30)
    true[:, 1:5] = rng.uniform(50, 300, (30, 4))
    true[:, 3:5] = rng.uniform(20, 60, (30, 2))
    true[:, 5] = 1
    true[:, 6] = rng.integers(0, 3, 30)
    pred = true.copy()
    pred[:, 5] = rng.uniform(0.5, 1.0, 30)
    out = ap_per_class(true, pred, 3)
    assert out["ap"].shape == (3,)
    assert (out["ap"] > 0.9).all()  # perfect boxes
    assert (out["f1"] > 0.9).all()


def test_confusion_matrix():
    cm = ConfusionMatrix(num_classes=2, conf_threshold=0.25)
    gts = np.array([
        [0, 50, 50, 20, 20, 1.0, 0],
        [0, 150, 150, 20, 20, 1.0, 1],
    ], np.float32)
    dets = np.array([
        [0, 50, 50, 20, 20, 0.9, 0],    # correct class 0
        [0, 150, 150, 20, 20, 0.9, 0],  # class confusion: pred 0, true 1
        [0, 300, 300, 20, 20, 0.9, 1],  # FP vs background
    ], np.float32)
    cm.update(dets, gts)
    assert cm.matrix[0, 0] == 1
    assert cm.matrix[0, 1] == 1
    assert cm.matrix[1, 2] == 1  # FP vs bg
    assert cm.matrix.sum() == 3


def test_voc_and_coco_matchers_agree_at_iou50():
    """The reference's de-facto integration test is agreement between
    independent mAP implementations on the same detections (README: 51.56
    built-in vs 51.82 Cartucho). Guard our two matchers the same way:
    realistic detections (jittered GT + noise FPs) must score within 1.5pt
    at IoU .5, and perfect detections score 1.0 on both."""
    from podtpu.metrics.map import mean_average_precision

    rng = np.random.default_rng(3)
    n_img, n_cls = 40, 4
    true_rows, pred_rows = [], []
    for img in range(n_img):
        for _ in range(rng.integers(1, 4)):
            cx, cy = rng.uniform(60, 200, 2)
            w, h = rng.uniform(30, 80, 2)
            c = rng.integers(0, n_cls)
            true_rows.append([img, cx, cy, w, h, 1.0, c])
            if rng.random() < 0.85:  # mostly-found GT, jittered
                pred_rows.append([img, cx + rng.normal(0, 3),
                                  cy + rng.normal(0, 3), w * rng.uniform(0.9, 1.1),
                                  h * rng.uniform(0.9, 1.1),
                                  rng.uniform(0.5, 1.0), c])
        if rng.random() < 0.4:  # noise FP
            pred_rows.append([img, *rng.uniform(40, 220, 2),
                              *rng.uniform(20, 60, 2), rng.uniform(0.1, 0.6),
                              rng.integers(0, n_cls)])
    true = np.asarray(true_rows, np.float32)
    pred = np.asarray(pred_rows, np.float32)
    voc = mean_average_precision(true, pred, n_cls, 0.5)
    coco = coco_eval(true, pred, n_cls)
    assert abs(voc - coco["AP50"]) < 0.015
    assert 0.5 < voc < 1.0  # non-degenerate scenario

    perfect = true.copy()
    perfect[:, 5] = 0.9
    assert mean_average_precision(true, perfect, n_cls, 0.5) == pytest.approx(1.0)
    assert coco_eval(true, perfect, n_cls)["AP50"] == pytest.approx(1.0)


def test_confusion_matrix_counts_fp_on_gtless_images():
    """An image with detections but no GT rows must still contribute its
    FP-vs-background column (the report iterates the id union, not GT ids)."""
    from podtpu.metrics.plots import build_confusion_matrix

    true = np.array([[0, 50, 50, 20, 20, 1.0, 0]], np.float32)
    pred = np.array([
        [0, 50, 50, 20, 20, 0.9, 0],   # TP on image 0
        [1, 30, 30, 20, 20, 0.9, 1],   # FP on GT-less image 1
    ], np.float32)
    cm = build_confusion_matrix(true, pred, num_classes=2)
    assert cm.matrix[0, 0] == 1
    assert cm.matrix[1, 2] == 1  # FP vs background from image 1
    assert cm.matrix.sum() == 2
    # all-GT-less corner: predictions only
    cm2 = build_confusion_matrix(np.zeros((0, 7), np.float32), pred,
                                 num_classes=2)
    assert cm2.matrix[:, 2].sum() == 2


def test_coco_eval_no_warnings_with_absent_classes():
    """Classes absent from GT must not trigger 'Mean of empty slice'."""
    import warnings

    true = np.array([[0, 50, 50, 20, 20, 1.0, 0]], np.float32)
    pred = np.array([[0, 50, 50, 20, 20, 0.9, 0]], np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out = coco_eval(true, pred, num_classes=5)
    assert out["AP50"] == 1.0
    assert out["per_class"][1:].sum() == 0.0


def test_eval_report_writes_artifacts(tmp_path):
    from podtpu.metrics import MeanAveragePrecision
    from podtpu.metrics.plots import write_eval_report

    metric = MeanAveragePrecision(num_classes=2, input_size=100)
    annots = -np.ones((2, 4, 5), np.float32)
    annots[0, 0] = [0.5, 0.5, 0.2, 0.2, 0]
    annots[1, 0] = [0.3, 0.3, 0.2, 0.2, 1]
    dets = np.zeros((2, 3, 6), np.float32)
    valid = np.zeros((2, 3), bool)
    dets[0, 0] = [50, 50, 20, 20, 0.9, 0]
    valid[0, 0] = True
    dets[1, 0] = [30, 30, 20, 20, 0.8, 1]
    valid[1, 0] = True
    metric.update_state(annots, dets, valid)

    out = write_eval_report(metric, ["a", "b"], str(tmp_path))
    import os

    assert os.path.exists(out["table"])
    assert os.path.exists(out["pr_curves"])
    assert os.path.exists(out["confusion_matrix"])
    text = open(out["table"]).read()
    assert "mAP" in text and "a" in text


def test_reference_results_json_schema_parity():
    """The reference repo checks in its real prediction artifact
    (results.json, 5320 detections on VOC test — produced by
    yolo2coco_pred_file_yolov3.py). Our CLI emits the same record schema:
    {image_id, category_id (1-based int), bbox [x,y,w,h floats], score}.
    Guarded: only runs when the reference checkout is present."""
    import json
    import os

    path = "/root/reference/results.json"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference artifact not available")
    ref = json.load(open(path))
    assert len(ref) > 1000
    rec = ref[0]
    assert set(rec) == {"image_id", "category_id", "bbox", "score"}
    assert isinstance(rec["category_id"], int) and rec["category_id"] >= 1
    assert len(rec["bbox"]) == 4
    # exercise the ACTUAL writer record builder against the artifact
    from yolo2coco_pred_file import coco_record

    ours = coco_record("000005", (10.0, 20.0, 4.0, 6.0, 0.5, 0.0), 1.0, 1.0)
    assert set(ours) == set(rec)
    assert type(ours["category_id"]) is type(rec["category_id"])
    assert ours["category_id"] == 1 and len(ours["bbox"]) == 4
    assert ours["bbox"][0] == 8.0  # x = cx - w/2
