"""NMS tests: padded XLA path semantics + Pallas kernel equivalence
(interpreter mode on CPU) + decode shapes."""

import jax.numpy as jnp
import numpy as np
import pytest

from podtpu.ops.boxes import cxcywh_to_xyxy
from podtpu.ops.decode import decode_yolov1, decode_yolov2, decode_yolov3
from podtpu.ops.nms import batched_class_aware_nms, nms_padded
from podtpu.ops.pallas.nms_kernel import pallas_greedy_suppress
from tests.helpers import VOC_ANCHORS, VOC_SCALED_ANCHORS


def greedy_oracle(boxes_xyxy, valid, thr):
    """Sequential numpy reference for suppression on score-sorted boxes."""
    k = len(boxes_xyxy)
    keep = valid.copy().astype(bool)
    for i in range(k):
        if not keep[i]:
            continue
        for j in range(k):
            if j == i or not keep[j]:
                continue
            a, b = boxes_xyxy[i], boxes_xyxy[j]
            iw = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
            ih = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
            inter = iw * ih
            ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
            if inter / (ua + 1e-6) > thr:
                keep[j] = False
    return keep


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_pallas_kernel_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    k = 64
    centers = rng.uniform(0, 200, (k, 2))
    wh = rng.uniform(5, 60, (k, 2))
    boxes = np.concatenate([centers - wh / 2, centers + wh / 2], -1).astype(np.float32)
    # score-sorted by construction: validity mask random
    valid = (rng.random(k) > 0.2).astype(np.float32)

    got = pallas_greedy_suppress(
        jnp.asarray(boxes)[None], jnp.asarray(valid)[None], 0.45, interpret=True
    )[0]
    want = greedy_oracle(boxes, valid, 0.45)
    np.testing.assert_array_equal(np.asarray(got) > 0.5, want)


def test_pallas_matches_xla_backend():
    rng = np.random.default_rng(3)
    n = 200
    boxes = np.zeros((n, 6), np.float32)
    boxes[:, 0:2] = rng.uniform(0, 400, (n, 2))
    boxes[:, 2:4] = rng.uniform(10, 120, (n, 2))
    boxes[:, 4] = rng.uniform(0, 1, n)
    boxes[:, 5] = rng.integers(0, 5, n)

    # max_detections == top_k so the output is the untruncated keep set
    out_x, val_x = nms_padded(jnp.asarray(boxes), top_k=128, max_detections=128,
                              backend="xla")
    # pallas interpret path: run the suppression stage directly on the same
    # candidate set the XLA path uses
    from podtpu.ops.nms import _CLASS_OFFSET
    import jax

    conf = boxes[:, 4]
    score = np.where(conf > 0.25, conf, -1.0)
    top_idx = np.argsort(-score, kind="stable")[:128]
    cand = boxes[top_idx]
    cand_valid = (score[top_idx] > 0).astype(np.float32)
    xyxy = np.asarray(cxcywh_to_xyxy(jnp.asarray(cand[:, :4])))
    span = max(np.abs(xyxy).max(), _CLASS_OFFSET) * 2.0 + 1.0
    offset_boxes = xyxy + cand[:, 5:6] * span
    keep_p = pallas_greedy_suppress(
        jnp.asarray(offset_boxes)[None], jnp.asarray(cand_valid)[None], 0.45,
        interpret=True,
    )[0]
    kept_p = set(map(tuple, cand[np.asarray(keep_p) > 0.5][:, :4].round(3).tolist()))
    kept_x = set(map(tuple, np.asarray(out_x)[np.asarray(val_x)][:, :4].round(3).tolist()))
    assert kept_p == kept_x


@pytest.mark.parametrize("seed,conf", [(0, 0.25), (1, 0.25), (2, 0.6),
                                        (3, 0.999), (4, 0.0)])
def test_early_exit_backend_matches_dense(seed, conf):
    """`xla_early` (data-dependent trip count + lazy IoU rows) must keep a
    bit-identical set to the dense fori_loop backend — including no-valid
    (conf 0.999 drops everything) and all-valid (conf 0.0) extremes."""
    rng = np.random.default_rng(seed)
    b, n = 3, 200
    boxes = np.zeros((b, n, 6), np.float32)
    boxes[..., 0:2] = rng.uniform(0, 300, (b, n, 2))
    boxes[..., 2:4] = rng.uniform(10, 120, (b, n, 2))
    boxes[..., 4] = rng.uniform(0, 1, (b, n))
    boxes[..., 5] = rng.integers(0, 5, (b, n))

    kw = dict(conf_threshold=conf, top_k=64, max_detections=64)
    out_d, val_d = batched_class_aware_nms(jnp.asarray(boxes), backend="xla",
                                           **kw)
    out_e, val_e = batched_class_aware_nms(jnp.asarray(boxes),
                                           backend="xla_early", **kw)
    np.testing.assert_array_equal(np.asarray(val_d), np.asarray(val_e))
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_e))


def test_nms_conf_strictness():
    # conf exactly at the threshold must be dropped (reference uses strict >)
    boxes = np.zeros((4, 6), np.float32)
    boxes[0] = [50, 50, 10, 10, 0.25, 0]
    boxes[1] = [80, 80, 10, 10, 0.26, 0]
    out, valid = nms_padded(jnp.asarray(boxes), conf_threshold=0.25,
                            top_k=4, max_detections=4)
    kept = np.asarray(out)[np.asarray(valid)]
    assert len(kept) == 1 and kept[0, 4] == pytest.approx(0.26)


def test_batched_nms_shapes():
    rng = np.random.default_rng(0)
    boxes = rng.uniform(0, 1, (3, 100, 6)).astype(np.float32)
    boxes[..., 4] = rng.uniform(0, 1, (3, 100))
    out, valid = batched_class_aware_nms(jnp.asarray(boxes), top_k=64,
                                         max_detections=16)
    assert out.shape == (3, 16, 6)
    assert valid.shape == (3, 16)


def test_host_nms_variants():
    """Dormant-variant surface (utils/yolo_utils.py nms_v1/v2, Ultralytics
    non_max_suppression): agreement on separated boxes, metric quirks where
    they differ."""
    from podtpu.ops.nms_host import nms_v1, nms_v2, non_max_suppression

    # two overlapping same-class boxes + one separate other-class box
    boxes = np.array([
        [50, 50, 40, 40, 0.9, 1],
        [52, 52, 40, 40, 0.8, 1],   # IoU ~0.82 with the first -> suppressed
        [150, 150, 30, 30, 0.7, 2],
    ], np.float32)
    for fn in (nms_v1, nms_v2):
        out = fn(boxes, conf_threshold=0.25, iou_threshold=0.45)
        assert out.shape == (2, 6)
        assert set(out[:, 5].tolist()) == {1.0, 2.0}
        assert 0.9 in out[:, 4] and 0.8 not in out[:, 4]

    # different class => never suppressed, even at perfect overlap
    b2 = np.array([[50, 50, 40, 40, 0.9, 1], [50, 50, 40, 40, 0.8, 2]],
                  np.float32)
    assert len(nms_v1(b2)) == 2 and len(nms_v2(b2)) == 2

    # v2's overlap metric is intersection/other-area (not IoU): a small box
    # fully inside a big same-class box has overlap 1.0 relative to itself
    # -> suppressed by v2; IoU is only ~0.25 -> kept by v1
    b3 = np.array([[50, 50, 40, 40, 0.9, 1], [50, 50, 20, 20, 0.8, 1]],
                  np.float32)
    assert len(nms_v1(b3, iou_threshold=0.45)) == 2
    assert len(nms_v2(b3, iou_threshold=0.45)) == 1

    # Ultralytics variant: raw rows, multi_label & merge options
    raw = np.array([
        [50, 50, 40, 40, 0.9, 0.8, 0.6, 0.0],
        [52, 52, 40, 40, 0.8, 0.9, 0.0, 0.0],
        [150, 150, 30, 30, 0.9, 0.0, 0.0, 0.9],
    ], np.float32)
    single = non_max_suppression(raw, conf_thres=0.25, iou_thres=0.45)
    assert single.shape[1] == 6
    assert len(single) == 2  # the two overlapping argmax-class-0 rows merge
    multi = non_max_suppression(raw, conf_thres=0.25, iou_thres=0.45,
                                multi_label=True)
    # multi-label keeps (box0, cls1) alongside the best (box0-ish, cls0)
    assert len(multi) >= 3
    merged = non_max_suppression(raw, conf_thres=0.25, iou_thres=0.45,
                                 merge=True)
    # reference merge-NMS drops survivors without a second contributor
    # (general.py:720 `redundant`): the lone class-2 box goes, only the
    # fused class-0 survivor remains
    assert len(merged) == 1 and merged[0, 5] == 0.0
    # merged survivor coordinates are the score-weighted blend, not box 0's
    x1 = merged[0, 0]
    assert 30.0 < x1 < 32.1 and not np.isclose(x1, 30.0)


@pytest.mark.slow
def test_host_device_merge_nms_agree():
    """The host Ultralytics variant and the device merge path implement the
    same reference matrix math — same survivors, same fused boxes."""
    from podtpu.ops.nms_host import non_max_suppression

    rng = np.random.default_rng(7)
    c = 3
    # clustered duplicates (merge-NMS's use case: random sparse boxes
    # rarely exceed IoU 0.45, and the redundant filter would drop all
    # singletons — on both paths)
    base = np.zeros((12, 4), np.float32)
    base[:, 0:2] = rng.uniform(60, 140, (12, 2))
    base[:, 2:4] = rng.uniform(30, 60, (12, 2))
    dups = [base + rng.normal(0, 1.5, base.shape).astype(np.float32)
            for _ in range(3)]
    boxes4 = np.concatenate([base] + dups)
    n = len(boxes4)
    raw = np.zeros((n, 5 + c), np.float32)
    raw[:, :4] = boxes4
    raw[:, 4] = rng.uniform(0.3, 1.0, n)   # obj, all above threshold
    raw[:, 5:] = rng.uniform(0, 1, (n, c))

    host = non_max_suppression(raw, conf_thres=0.25, iou_thres=0.45,
                               merge=True, max_det=10)

    # single-label candidates with the host's conf definition (obj * cls)
    cls_conf = raw[:, 5:] * raw[:, 4:5]
    j = cls_conf.argmax(1)
    cand = np.concatenate(
        [raw[:, :4], cls_conf[np.arange(n), j, None],
         j[:, None].astype(np.float32)], axis=1)
    out, valid = batched_class_aware_nms(
        jnp.asarray(cand)[None], conf_threshold=0.25, iou_threshold=0.45,
        top_k=n, max_detections=10, merge=True)
    dev = np.asarray(out)[0][np.asarray(valid)[0]]
    dev_xyxy = np.concatenate(
        [np.asarray(cxcywh_to_xyxy(jnp.asarray(dev[:, :4]))), dev[:, 4:]],
        axis=1)
    assert len(host) == len(dev_xyxy) > 0
    np.testing.assert_allclose(
        sorted(map(tuple, host.round(3))),
        sorted(map(tuple, dev_xyxy.round(3))), atol=2e-3)


def test_device_nms_agnostic():
    """agnostic=True suppresses across classes (general.py:712: offset 0)."""
    boxes = np.zeros((1, 4, 6), np.float32)
    boxes[0, 0] = [50, 50, 40, 40, 0.9, 1]
    boxes[0, 1] = [50, 50, 40, 40, 0.8, 2]  # same box, other class
    out, valid = batched_class_aware_nms(jnp.asarray(boxes), top_k=4,
                                         max_detections=4)
    assert int(np.asarray(valid).sum()) == 2  # class-aware: both survive
    out, valid = batched_class_aware_nms(jnp.asarray(boxes), top_k=4,
                                         max_detections=4, agnostic=True)
    kept = np.asarray(out)[np.asarray(valid)]
    assert len(kept) == 1 and kept[0, 4] == pytest.approx(0.9)


def test_device_nms_classes_filter():
    """classes=(...) keeps only those class ids (general.py:697-698)."""
    boxes = np.zeros((1, 4, 6), np.float32)
    boxes[0, 0] = [50, 50, 40, 40, 0.9, 1]
    boxes[0, 1] = [150, 150, 40, 40, 0.8, 2]
    boxes[0, 2] = [250, 250, 40, 40, 0.7, 3]
    out, valid = batched_class_aware_nms(jnp.asarray(boxes), top_k=4,
                                         max_detections=4, classes=(2, 3))
    kept = np.asarray(out)[np.asarray(valid)]
    assert sorted(kept[:, 5].tolist()) == [2.0, 3.0]


@pytest.mark.slow  # 5 param cases x a fresh NMS jit compile each
@pytest.mark.parametrize("seed,max_det", [(0, 32), (1, 32), (2, 32),
                                          (0, 4), (1, 4)])
def test_device_merge_nms_matches_reference_math(seed, max_det):
    """merge=True must reproduce the Ultralytics merge-NMS matrix math
    (general.py:710-721) — keep set truncated to max_det FIRST, then
    weights = (IoU > thr) * scores over ALL candidates, weighted-mean
    boxes, survivors need >= 2 contributors (no backfill past max_det)."""
    rng = np.random.default_rng(seed)
    n, k = 64, 32
    boxes = np.zeros((n, 6), np.float32)
    boxes[:, 0:2] = rng.uniform(40, 160, (n, 2))
    boxes[:, 2:4] = rng.uniform(20, 80, (n, 2))
    boxes[:, 4] = rng.uniform(0, 1, n)
    boxes[:, 5] = rng.integers(0, 3, n)

    out, valid = batched_class_aware_nms(
        jnp.asarray(boxes)[None], conf_threshold=0.25, iou_threshold=0.45,
        top_k=k, max_detections=max_det, merge=True)
    got = np.asarray(out)[0][np.asarray(valid)[0]]

    # numpy oracle of the same padded pipeline + reference merge math
    score = np.where(boxes[:, 4] > 0.25, boxes[:, 4], -1.0)
    idx = np.argsort(-score, kind="stable")[:k]
    cand = boxes[idx]
    cand_valid = score[idx] > 0
    xyxy = np.asarray(cxcywh_to_xyxy(jnp.asarray(cand[:, :4])))
    span = max(np.abs(xyxy).max(), 8192.0) * 2.0 + 1.0
    off = xyxy + cand[:, 5:6] * span
    keep = greedy_oracle(off, cand_valid, 0.45)
    # reference truncates i = i[:max_det] before merging (score order ==
    # candidate order here)
    keep &= np.cumsum(keep) <= max_det

    ious = np.stack([_iou_row(off[i], off) for i in range(k)])
    contrib = (ious > 0.45) & cand_valid[None, :]
    w = contrib * np.where(cand_valid, cand[:, 4], 0.0)[None, :]
    merged_xyxy = (w @ xyxy) / np.maximum(w.sum(1, keepdims=True), 1e-12)
    want_rows = []
    for i in range(k):
        if not keep[i] or contrib[i].sum() <= 1:  # redundant filter
            continue
        x1, y1, x2, y2 = merged_xyxy[i]
        want_rows.append([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1,
                          cand[i, 4], cand[i, 5]])
    want = np.array(sorted(want_rows, key=lambda r: -r[4]), np.float32)
    assert len(got) == len(want) > 0
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def _iou_row(box, others):
    xy1 = np.maximum(box[:2], others[:, :2])
    xy2 = np.minimum(box[2:4], others[:, 2:4])
    inter = np.clip(xy2 - xy1, 0, None).prod(axis=1)
    a1 = np.clip(box[2:4] - box[:2], 0, None).prod()
    a2 = np.clip(others[:, 2:4] - others[:, :2], 0, None).prod(axis=1)
    return inter / (a1 + a2 - inter + 1e-9)


def test_merge_nms_single_candidate_unmerged():
    """The reference merges only when 1 < n: a lone detection survives
    un-merged instead of being dropped by the redundancy filter."""
    boxes = np.zeros((1, 4, 6), np.float32)
    boxes[0, 0] = [50, 50, 40, 40, 0.9, 1]
    out, valid = batched_class_aware_nms(jnp.asarray(boxes), top_k=4,
                                         max_detections=4, merge=True)
    kept = np.asarray(out)[np.asarray(valid)]
    assert len(kept) == 1
    np.testing.assert_allclose(kept[0, :4], [50, 50, 40, 40], rtol=1e-5)


def test_multilabel_decode_and_nms():
    """multi_label decode emits conf = sigmoid(obj)*sigmoid(cls_c) per
    (anchor, class) (general.py:684-692); NMS then keeps one detection per
    strong class on the same box."""
    from podtpu.ops.decode import decode_anchor_head

    b, c, a = 1, 4, 3
    pred = np.full((b, 2, 2, a * (5 + c)), -12.0, np.float32)
    # anchor 0 of cell (0,0): strong obj, classes 1 and 3 hot
    view = pred.reshape(b, 2, 2, a, 5 + c)
    view[0, 0, 0, 0, :5] = [0.0, 0.0, 0.0, 0.0, 6.0]
    view[0, 0, 0, 0, 5 + 1] = 5.0
    view[0, 0, 0, 0, 5 + 3] = 4.0
    anchors = jnp.asarray([[1.0, 1.0], [2.0, 2.0], [3.0, 3.0]], jnp.float32)
    cand = decode_anchor_head(jnp.asarray(pred), c, anchors, 64,
                              multi_label=True)
    assert cand.shape == (b, 2 * 2 * a * c, 6)
    conf = np.asarray(cand[0, :, 4])
    obj = 1 / (1 + np.exp(-6.0))
    np.testing.assert_allclose(conf.max(), obj / (1 + np.exp(-5.0)),
                               rtol=1e-5)

    out, valid = batched_class_aware_nms(cand, conf_threshold=0.5,
                                         top_k=16, max_detections=8)
    kept = np.asarray(out)[0][np.asarray(valid)[0]]
    assert sorted(kept[:, 5].tolist()) == [1.0, 3.0]  # same box, two labels
    np.testing.assert_allclose(kept[0, :4], kept[1, :4], rtol=1e-5)


def test_make_postprocess_nms_options():
    """cfg `nms_options` plumbs multi_label/merge/agnostic/classes into the
    shared decode+NMS postprocess used by eval and the serving exports."""
    from podtpu.train.steps import make_decoder, make_postprocess

    cfg = {
        "model": "yolov4-tiny", "num_classes": 3, "input_size": 64,
        "anchors": [[4, 5], [6, 8], [10, 9], [12, 16], [18, 14],
                    [20, 24], [32, 28], [40, 44], [56, 52]],
        "conf_threshold": 0.1, "top_k_candidates": 32, "max_detections": 8,
        "nms_options": {"multi_label": True, "merge": True},
    }
    post = make_postprocess(cfg)
    preds = [jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (2, s, s, 3 * 8)).astype(np.float32)) for s in (8, 4, 2)]
    dets, valid = post(preds)
    assert dets.shape == (2, 8, 6) and valid.shape == (2, 8)

    # nms_options.backend selects the suppression backend (same results)
    post_early = make_postprocess({**cfg, "nms_options": {
        **cfg["nms_options"], "backend": "xla_early"}})
    dets_e, valid_e = post_early(preds)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid_e))
    np.testing.assert_allclose(np.asarray(dets), np.asarray(dets_e),
                               rtol=1e-6)

    with pytest.raises(ValueError, match="multi_label"):
        make_decoder({"model": "yolov1", "num_classes": 3, "input_size": 64,
                      "num_boxes": 2}, multi_label=True)


@pytest.mark.slow
def test_decode_shapes_and_scale():
    b, c = 2, 20
    p2 = jnp.zeros((b, 13, 13, 5 * 25))
    d2 = decode_yolov2(p2, c, VOC_SCALED_ANCHORS, 416)
    assert d2.shape == (b, 13 * 13 * 5, 6)
    # zero logits: pxy = (0.5 + grid)*32, first cell -> 16
    assert float(d2[0, 0, 0]) == pytest.approx(16.0)
    assert float(d2[0, 0, 4]) == pytest.approx(0.5)

    preds = [jnp.zeros((b, s, s, 75)) for s in (52, 26, 13)]
    d3 = decode_yolov3(preds, c, VOC_ANCHORS, 416)
    assert d3.shape == (b, (52 * 52 + 26 * 26 + 13 * 13) * 3, 6)
    # zero logits at scale 0: pwh = exp(0)*anchor = anchor in pixels
    np.testing.assert_allclose(np.asarray(d3[0, 0, 2:4]), [10, 13], rtol=1e-5)

    p1 = jnp.zeros((b, 7 * 7 * 30))
    d1 = decode_yolov1(p1, c, 2, 448)
    assert d1.shape == (b, 49, 6)
    # zero logits: sigmoid=0.5 -> x=(0.5+0)*64=32, w=0.5*7*64=224
    np.testing.assert_allclose(np.asarray(d1[0, 0, :4]), [32, 32, 224, 224],
                               rtol=1e-5)


def test_decode_reference_goldens():
    """Decode parity vs goldens from the reference decode_predictions run
    under torch-cpu on the same inputs (NCHW->NHWC transpose only; row 0 is
    the (cell 0,0, anchor 0) candidate in both flatten orders, and the
    [:, :, :5] sum is order-invariant)."""
    from tests.helpers import VOC_ANCHORS, VOC_SCALED_ANCHORS, nchw_to_nhwc, normal

    C = 20
    p2 = jnp.asarray(nchw_to_nhwc(normal((2, 5 * 25, 13, 13), 500)))
    o2 = decode_yolov2(p2, C, VOC_SCALED_ANCHORS, 416)
    assert float(jnp.sum(o2[:, :, :5])) == pytest.approx(1730470.5, rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(o2[0, 0]),
        [21.367353, 7.7130294, 115.44437, 68.32956, 0.6570192, 8.0],
        rtol=1e-4,
    )

    p3 = jnp.asarray(nchw_to_nhwc(normal((2, 75, 13, 13), 501)))
    # scale-2 slice: feed as the only layer with its anchor triplet by
    # building a single-level decode via the head helper
    from podtpu.ops.decode import decode_anchor_head

    anchors = jnp.asarray(VOC_ANCHORS, jnp.float32)[6:9] / 32.0
    o3 = decode_anchor_head(p3, C, anchors, 416)
    assert float(jnp.sum(o3[:, :, :5])) == pytest.approx(1126888.8, rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(o3[0, 0]),
        [7.8630276, 15.015657, 49.260624, 18.858927, 0.88456035, 10.0],
        rtol=1e-4,
    )

    p1 = jnp.asarray(normal((2, 7 * 7 * 30), 502))
    o1 = decode_yolov1(p1, C, 2, 448)
    assert float(jnp.sum(o1[:, :, :5])) == pytest.approx(88583.375, rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(o1[0, 0]),
        [29.534664, 39.148933, 71.283775, 85.43206, 0.53732747, 13.0],
        rtol=1e-4,
    )
