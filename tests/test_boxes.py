"""Box-geometry unit tests, incl. golden values from the reference's
bbox_iou (utils/yolo_utils.py:75-144) run under torch-cpu."""

import jax.numpy as jnp
import numpy as np
import pytest

from podtpu.ops.boxes import (
    bbox_iou,
    cxcywh_to_xyxy,
    pairwise_iou,
    wh_iou,
    xyxy_to_cxcywh,
)

B3 = jnp.array([[0.5, 0.5, 4.0, 4.0]])
B4 = jnp.array([[0.55, 0.55, 5.0, 5.0]])


def test_iou_identity():
    box = jnp.array([[10.0, 10.0, 4.0, 4.0]])
    assert bbox_iou(box, box)[0, 0] == pytest.approx(1.0, abs=1e-5)


def test_iou_disjoint():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[10.0, 10.0, 2.0, 2.0]])
    assert bbox_iou(a, b)[0, 0] == pytest.approx(0.0, abs=1e-7)


def test_iou_hand_computed():
    # 2x2 at origin vs 2x2 shifted by 1 in x: inter = 1*2 = 2, union = 6.
    a = jnp.array([[0.0, 0.0, 2.0, 2.0]])
    b = jnp.array([[1.0, 0.0, 2.0, 2.0]])
    assert bbox_iou(a, b)[0, 0] == pytest.approx(2.0 / 6.0, abs=1e-6)


def test_reference_goldens_xyxy():
    # Goldens from the reference bbox_iou on the same inputs (torch cpu).
    assert float(bbox_iou(B3, B4, x1y1x2y2=True)[0, 0]) == pytest.approx(
        0.590694785118103, rel=1e-5
    )
    assert float(bbox_iou(B3, B4, x1y1x2y2=True, GIoU=True)[0, 0]) == pytest.approx(
        0.5857564210891724, rel=1e-5
    )
    assert float(bbox_iou(B3, B4, x1y1x2y2=True, DIoU=True)[0, 0]) == pytest.approx(
        0.5770836472511292, rel=1e-5
    )
    assert float(bbox_iou(B3, B4, x1y1x2y2=True, CIoU=True)[0, 0]) == pytest.approx(
        0.5770836472511292, rel=1e-5
    )


def test_reference_golden_ciou_center_format():
    # The reference's own smoke check pair (yolov2_loss.py:330-336).
    t = jnp.array([[0.5, 0.5, 1.2856, 0.8026]])
    p = jnp.array([[0.5498, 0.5498, 1.1052, 1.0101]])
    assert float(bbox_iou(t, p, CIoU=True)[0, 0]) == pytest.approx(
        0.7009100317955017, rel=1e-4
    )


def test_format_roundtrip():
    rng = np.random.default_rng(0)
    cxcywh = jnp.asarray(rng.uniform(1, 50, (16, 4)).astype(np.float32))
    back = xyxy_to_cxcywh(cxcywh_to_xyxy(cxcywh))
    np.testing.assert_allclose(back, cxcywh, rtol=1e-5)


def test_pairwise_iou_matches_elementwise():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 50, (5, 2)).astype(np.float32)
    wh = rng.uniform(1, 20, (5, 2)).astype(np.float32)
    boxes = np.concatenate([a, a + wh], -1)
    m = pairwise_iou(jnp.asarray(boxes), jnp.asarray(boxes))
    np.testing.assert_allclose(np.diag(np.asarray(m)), np.ones(5), atol=1e-5)
    assert np.all(np.asarray(m) <= 1.0 + 1e-6)


def test_wh_iou_matches_corner_formula():
    wh1 = jnp.array([[4.0, 6.0]])
    wh2 = jnp.array([[2.0, 12.0], [4.0, 6.0]])
    got = wh_iou(wh1, wh2)
    # min(4,2)*min(6,12)=12; union=24+24-12=36
    assert got[0, 0] == pytest.approx(12.0 / 36.0, rel=1e-5)
    assert got[0, 1] == pytest.approx(1.0, rel=1e-5)
