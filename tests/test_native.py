"""Native C++ mAP matcher: builds, matches the numpy fallback exactly."""

import numpy as np
import pytest

from podtpu.native import get_lib, native_class_tp_fp


def _numpy_oracle(dets, gts, thr):
    """Pure-python greedy matcher (the semantics both paths must share)."""
    n = len(dets)
    tp = np.zeros(n, np.float32)
    fp = np.zeros(n, np.float32)
    used = {}
    for img in np.unique(gts[:, 0]).astype(int):
        used[img] = np.zeros((gts[:, 0] == img).sum(), bool)
    gt_groups = {img: gts[gts[:, 0] == img] for img in used}
    for i, det in enumerate(dets):
        img = int(det[0])
        rows = gt_groups.get(img)
        if rows is None or not len(rows):
            fp[i] = 1
            continue
        best, best_iou = -1, 0.0
        for g, gt in enumerate(rows):
            ax1, ay1 = det[1] - det[3] / 2, det[2] - det[4] / 2
            ax2, ay2 = det[1] + det[3] / 2, det[2] + det[4] / 2
            bx1, by1 = gt[1] - gt[3] / 2, gt[2] - gt[4] / 2
            bx2, by2 = gt[1] + gt[3] / 2, gt[2] + gt[4] / 2
            iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
            ih = max(0.0, min(ay2, by2) - max(ay1, by1))
            inter = iw * ih
            ua = ((ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1)
                  - inter + 1e-6)
            v = inter / ua
            if v > best_iou:
                best_iou, best = v, g
        if best_iou > thr and not used[img][best]:
            tp[i] = 1
            used[img][best] = True
        else:
            fp[i] = 1
    return tp, fp


def test_native_builds():
    assert get_lib() is not None, "g++ build of the native matcher failed"


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    n_det, n_gt = 300, 120
    dets = np.zeros((n_det, 7), np.float32)
    dets[:, 0] = rng.integers(0, 20, n_det)
    dets[:, 1:3] = rng.uniform(0, 400, (n_det, 2))
    dets[:, 3:5] = rng.uniform(10, 80, (n_det, 2))
    dets[:, 5] = rng.uniform(0, 1, n_det)
    gts = np.zeros((n_gt, 7), np.float32)
    gts[:, 0] = rng.integers(0, 20, n_gt)
    gts[:, 1:3] = rng.uniform(0, 400, (n_gt, 2))
    gts[:, 3:5] = rng.uniform(10, 80, (n_gt, 2))
    gts[:, 5] = 1.0

    dets = dets[np.argsort(-dets[:, 5], kind="stable")]
    got = native_class_tp_fp(dets, gts, 0.5)
    assert got is not None
    want = _numpy_oracle(dets, gts, 0.5)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_map_uses_same_result_with_and_without_native(monkeypatch):
    from podtpu.metrics import mean_average_precision

    rng = np.random.default_rng(7)
    true = np.zeros((50, 7), np.float32)
    true[:, 0] = rng.integers(0, 10, 50)
    true[:, 1:3] = rng.uniform(50, 350, (50, 2))
    true[:, 3:5] = rng.uniform(20, 80, (50, 2))
    true[:, 5] = 1.0
    true[:, 6] = rng.integers(0, 3, 50)
    pred = true.copy()
    pred[:, 1:3] += rng.normal(0, 8, (50, 2))  # jitter
    pred[:, 5] = rng.uniform(0.3, 1.0, 50)

    with_native = mean_average_precision(true, pred, 3)

    import podtpu.metrics.map as map_mod

    monkeypatch.setattr("podtpu.native.build._LIB", False)
    without = mean_average_precision(true, pred, 3)
    assert with_native == pytest.approx(without, abs=1e-6)
