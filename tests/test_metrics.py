"""mAP semantics tests: hand-computed cases mirroring the reference's
greedy matching (utils/yolo_utils.py:351-456)."""

import numpy as np
import pytest

from podtpu.metrics import MeanAveragePrecision, mean_average_precision, metrics_per_class

# rows: [img_idx, cx, cy, w, h, conf, cls]


def test_perfect_detection():
    true = np.array([[0, 50, 50, 20, 20, 1.0, 0]])
    pred = np.array([[0, 50, 50, 20, 20, 0.9, 0]])
    assert mean_average_precision(true, pred, 1) == pytest.approx(1.0, abs=1e-5)


def test_miss_is_zero():
    true = np.array([[0, 50, 50, 20, 20, 1.0, 0]])
    pred = np.array([[0, 200, 200, 20, 20, 0.9, 0]])
    assert mean_average_precision(true, pred, 1) == pytest.approx(0.0, abs=1e-5)


def test_duplicate_detection_counts_fp():
    """Second detection on the same GT is an FP (one-match-per-GT)."""
    true = np.array([[0, 50, 50, 20, 20, 1.0, 0]])
    pred = np.array([
        [0, 50, 50, 20, 20, 0.9, 0],
        [0, 51, 51, 20, 20, 0.8, 0],
    ])
    # TP then FP: precision curve [1, 0.5], recall [1, 1] -> AP = 1.0
    assert mean_average_precision(true, pred, 1) == pytest.approx(1.0, abs=1e-4)


def test_half_recall():
    true = np.array([
        [0, 50, 50, 20, 20, 1.0, 0],
        [1, 50, 50, 20, 20, 1.0, 0],
    ])
    pred = np.array([[0, 50, 50, 20, 20, 0.9, 0]])
    # 1 of 2 found at precision 1 -> AP = 0.5
    assert mean_average_precision(true, pred, 1) == pytest.approx(0.5, abs=1e-4)


def test_class_confusion_and_absent_class_quirk():
    """A class with zero GT contributes AP=0 to the mean (reference quirk)."""
    true = np.array([[0, 50, 50, 20, 20, 1.0, 0]])
    pred = np.array([[0, 50, 50, 20, 20, 0.9, 0]])
    # class 1 has no GT -> AP_1 = 0 -> mAP = 0.5
    assert mean_average_precision(true, pred, 2) == pytest.approx(0.5, abs=1e-4)


def test_confidence_ordering_matters():
    """A high-confidence FP before the TP drags AP below 1."""
    true = np.array([[0, 50, 50, 20, 20, 1.0, 0]])
    pred = np.array([
        [0, 200, 200, 20, 20, 0.95, 0],  # FP first
        [0, 50, 50, 20, 20, 0.60, 0],    # TP second
    ])
    # precision at the recall-change point = 1/2
    assert mean_average_precision(true, pred, 1) == pytest.approx(0.5, abs=1e-4)


def test_metrics_per_class():
    true = np.array([
        [0, 50, 50, 20, 20, 1.0, 0],
        [0, 150, 150, 20, 20, 1.0, 1],
    ])
    pred = np.array([
        [0, 50, 50, 20, 20, 0.9, 0],      # TP class 0
        [0, 400, 400, 20, 20, 0.8, 0],    # FP class 0
    ])
    m = metrics_per_class(true, pred, 2)
    np.testing.assert_allclose(m[0], [1.0, 1.0, 1.0, 0.0], atol=1e-4)
    np.testing.assert_allclose(m[1], [0.0, 0.0, 0.0, 1.0], atol=1e-4)


def test_stateful_accumulator():
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
    assert metric.result() == pytest.approx(1.0, abs=1e-4)
    metric.reset_states()
    assert metric.img_idx == 0


def _rows(n, n_img, num_classes, seed, conf=True):
    r = np.random.default_rng(seed)
    out = np.zeros((n, 7), np.float32)
    out[:, 0] = r.integers(0, n_img, n)
    out[:, 1:3] = r.uniform(30, 370, (n, 2))
    out[:, 3:5] = r.uniform(15, 90, (n, 2))
    out[:, 5] = r.uniform(0.3, 1.0, n) if conf else 1.0
    out[:, 6] = r.integers(0, num_classes, n)
    return out


def test_map_reference_golden():
    """mAP parity vs a golden value from the reference's
    mean_average_precision (utils/yolo_utils.py:351-456, torch cpu) on the
    exact same random detection set (regenerated from seeded streams)."""
    true = _rows(120, 15, 5, 900, conf=False)
    pred = _rows(200, 15, 5, 901)
    jit = true[:60].copy()
    r = np.random.default_rng(902)
    jit[:, 1:3] += r.normal(0, 6, (60, 2))
    jit[:, 5] = r.uniform(0.4, 1, 60)
    pred = np.concatenate([pred, jit])
    got = mean_average_precision(true, pred, 5)
    assert got == pytest.approx(0.12551620602607727, rel=1e-5)
