"""Target-assignment parity: the vectorized scan encoders must match an
independent numpy oracle that implements the reference's loop semantics
(yolov2_loss.py:260-315, yolov3_loss.py:292-362, yolov1_loss.py:114-146),
including write order (later GT overwrites for v2/v3; first wins for v1)."""

import numpy as np
import pytest

from podtpu.ops.assign import encode_anchor_targets, encode_yolov1_targets
from tests.helpers import VOC_ANCHORS, VOC_SCALED_ANCHORS, make_targets

C = 20


def _wh_iou_np(wh, anchors):
    inter = np.minimum(wh[0], anchors[:, 0]) * np.minimum(wh[1], anchors[:, 1])
    union = wh[0] * wh[1] + anchors[:, 0] * anchors[:, 1] - inter + 1e-6
    return inter / union


def oracle_v2(target, num_classes, scaled_anchors, layer_w, layer_h, thr=0.5):
    anchors = np.asarray(scaled_anchors, np.float32)
    b, t, _ = target.shape
    a = len(anchors)
    mask = np.zeros((b, layer_h, layer_w, a), np.float32)
    noobj = np.ones((b, layer_h, layer_w, a), np.float32)
    tbox = np.zeros((b, layer_h, layer_w, a, 4), np.float32)
    tconf = np.zeros((b, layer_h, layer_w, a), np.float32)
    tcls = np.zeros((b, layer_h, layer_w, a, num_classes), np.float32)
    for bi in range(b):
        for ti in range(t):
            if target[bi, ti].sum() <= 0:
                continue
            gx = target[bi, ti, 0] * layer_w
            gy = target[bi, ti, 1] * layer_h
            gw = target[bi, ti, 2] * layer_w
            gh = target[bi, ti, 3] * layer_h
            gi, gj = int(gx), int(gy)
            iou = _wh_iou_np((gw, gh), anchors)
            noobj[bi, gj, gi, iou > thr] = 0
            best = int(np.argmax(iou))
            mask[bi, gj, gi, best] = 1
            tbox[bi, gj, gi, best] = [gx - gi, gy - gj,
                                      gw / anchors[best, 0], gh / anchors[best, 1]]
            tconf[bi, gj, gi, best] = 1
            # reference v2 encoders set ONLY the class bit — no row reset
            # (yolov2_loss.py:165,309): same-slot collisions accumulate
            tcls[bi, gj, gi, best, int(target[bi, ti, 4])] = 1
    return mask, noobj, tbox, tconf, tcls


def oracle_v3_layer(target, num_classes, anchors, input_size, layer_idx,
                    layer_w, layer_h, thr=0.5, cls_pos=1.0, cls_neg=0.0,
                    cls_accumulate=False):
    anchors = np.asarray(anchors, np.float32)
    scaled = anchors[3 * layer_idx:3 * layer_idx + 3] * np.array(
        [layer_w / input_size, layer_h / input_size], np.float32
    )
    b, t, _ = target.shape
    mask = np.zeros((b, layer_h, layer_w, 3), np.float32)
    noobj = np.ones((b, layer_h, layer_w, 3), np.float32)
    tbox = np.zeros((b, layer_h, layer_w, 3, 4), np.float32)
    tconf = np.zeros((b, layer_h, layer_w, 3), np.float32)
    tcls = np.zeros((b, layer_h, layer_w, 3, num_classes), np.float32)
    for bi in range(b):
        for ti in range(t):
            if target[bi, ti].sum() <= 0:
                continue
            gw_px = target[bi, ti, 2] * input_size
            gh_px = target[bi, ti, 3] * input_size
            iou = _wh_iou_np((gw_px, gh_px), anchors)
            best = int(np.argmax(iou))
            if best < 3 * layer_idx or best >= 3 * layer_idx + 3:
                continue
            iou_local = iou[3 * layer_idx:3 * layer_idx + 3]
            best -= 3 * layer_idx
            gx = target[bi, ti, 0] * layer_w
            gy = target[bi, ti, 1] * layer_h
            gw = target[bi, ti, 2] * layer_w
            gh = target[bi, ti, 3] * layer_h
            gi, gj = int(gx), int(gy)
            noobj[bi, gj, gi, iou_local > thr] = 0
            mask[bi, gj, gi, best] = 1
            tbox[bi, gj, gi, best] = [gx - gi, gy - gj,
                                      gw / scaled[best, 0], gh / scaled[best, 1]]
            tconf[bi, gj, gi, best] = 1
            if not cls_accumulate:  # smoothed writers reset the row
                tcls[bi, gj, gi, best] = cls_neg
            tcls[bi, gj, gi, best, int(target[bi, ti, 4])] = cls_pos
    return mask, noobj, tbox, tconf, tcls


@pytest.mark.parametrize("backend", ["scan", "dense"])
def test_v2_assignment_matches_oracle(backend):
    target = make_targets(6, 12, C, seed=3)
    got = encode_anchor_targets(target, C, VOC_SCALED_ANCHORS, 13, 13, 0.5,
                                cls_accumulate=True, backend=backend)
    want = oracle_v2(target, C, VOC_SCALED_ANCHORS, 13, 13)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, atol=1e-5)


@pytest.mark.parametrize("backend", ["scan", "dense"])
def test_v2_overwrite_semantics(backend):
    # Two GTs in the same cell matching the same anchor: the later wins the
    # box/mask slot, but the class bits ACCUMULATE (yolov2_loss.py:309 sets
    # only tcls[..., cid] = 1 — no row reset).
    target = -np.ones((1, 4, 5), np.float32)
    target[0, 0] = [0.5, 0.5, 0.30, 0.30, 2]
    target[0, 1] = [0.52, 0.52, 0.32, 0.32, 7]
    got = encode_anchor_targets(target, C, VOC_SCALED_ANCHORS, 13, 13, 0.5,
                                cls_accumulate=True, backend=backend)
    want = oracle_v2(target, C, VOC_SCALED_ANCHORS, 13, 13)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, atol=1e-5)
    # both classes supervised at the collided slot; box is GT #1's
    row = np.asarray(got.tcls)[0, 6, 6].max(axis=0)
    assert row[2] == 1.0 and row[7] == 1.0
    assert np.asarray(got.tbox)[0, 6, 6].sum(axis=0)[2] == pytest.approx(
        0.32 * 13 / VOC_SCALED_ANCHORS[np.asarray(
            got.mask)[0, 6, 6].argmax()][0], rel=1e-4)


@pytest.mark.parametrize("backend", ["scan", "dense"])
@pytest.mark.parametrize("accumulate", [True, False])
def test_v3_assignment_matches_oracle_all_layers(backend, accumulate):
    target = make_targets(5, 10, C, seed=4)
    for layer_idx, hw in enumerate((52, 26, 13)):
        got = encode_anchor_targets(
            target, C,
            np.asarray(VOC_ANCHORS, np.float32)[3 * layer_idx:3 * layer_idx + 3]
            * (hw / 416.0),
            hw, hw, 0.5,
            match_anchors=VOC_ANCHORS,
            layer_anchor_slice=(3 * layer_idx, 3 * layer_idx + 3),
            match_scale=(416.0, 416.0), cls_accumulate=accumulate,
            backend=backend,
        )
        want = oracle_v3_layer(target, C, VOC_ANCHORS, 416, layer_idx, hw, hw,
                               cls_accumulate=accumulate)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w, atol=1e-5)


@pytest.mark.parametrize("backend", ["scan", "dense"])
def test_v3_label_smoothing_values(backend):
    target = -np.ones((1, 2, 5), np.float32)
    target[0, 0] = [0.5, 0.5, 0.8, 0.8, 3]  # huge box -> best anchor in layer 2
    got = encode_anchor_targets(
        target, C, np.asarray(VOC_ANCHORS, np.float32)[6:9] * (13 / 416.0),
        13, 13, 0.5,
        match_anchors=VOC_ANCHORS, layer_anchor_slice=(6, 9),
        match_scale=(416.0, 416.0), cls_pos=0.995, cls_neg=0.005,
        backend=backend,
    )
    cell = np.asarray(got.tcls)[0, 6, 6]
    assigned = np.asarray(got.mask)[0, 6, 6].astype(bool)
    assert assigned.any()
    row = cell[assigned][0]
    assert row[3] == np.float32(0.995)
    assert np.all(row[np.arange(C) != 3] == np.float32(0.005))


@pytest.mark.parametrize("backend", ["scan", "dense"])
def test_v1_first_gt_wins(backend):
    target = -np.ones((1, 3, 5), np.float32)
    target[0, 0] = [0.5, 0.5, 0.2, 0.2, 4]
    target[0, 1] = [0.51, 0.51, 0.3, 0.3, 9]  # same cell, must be ignored
    got = encode_yolov1_targets(target, C, 7, backend=backend)
    assert np.asarray(got.mask)[0, 3, 3] == 1.0
    assert np.asarray(got.tcls)[0, 3, 3, 4] == 1.0
    assert np.asarray(got.tcls)[0, 3, 3, 9] == 0.0
    # w/h stored normalized (yolov1_loss.py:143)
    np.testing.assert_allclose(np.asarray(got.tbox)[0, 3, 3, 2:], [0.2, 0.2], atol=1e-6)


@pytest.mark.parametrize("backend", ["scan", "dense"])
def test_v1_assignment_random(backend):
    target = make_targets(4, 9, C, seed=5)
    got = encode_yolov1_targets(target, C, 7, backend=backend)
    # oracle: first GT per cell
    b = target.shape[0]
    mask = np.zeros((b, 7, 7), np.float32)
    tcls = np.zeros((b, 7, 7, C), np.float32)
    tbox = np.zeros((b, 7, 7, 4), np.float32)
    for bi in range(b):
        for ti in range(target.shape[1]):
            if target[bi, ti].sum() <= 0:
                continue
            gx, gy = target[bi, ti, 0] * 7, target[bi, ti, 1] * 7
            gi, gj = int(gx), int(gy)
            if mask[bi, gj, gi] == 0:
                mask[bi, gj, gi] = 1
                tcls[bi, gj, gi, int(target[bi, ti, 4])] = 1
                tbox[bi, gj, gi] = [gx - gi, gy - gj,
                                    target[bi, ti, 2], target[bi, ti, 3]]
    np.testing.assert_allclose(np.asarray(got.mask), mask, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.tcls), tcls, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.tbox), tbox, atol=1e-5)
