"""Box geometry primitives (IoU family, format conversions).

Vectorized jnp counterparts of the reference's torch helpers
(`bbox_iou`: /root/reference/utils/yolo_utils.py:75-144; format converters:
utils/general.py:536-637). Everything here is elementwise/broadcasting, VPU
friendly, and differentiable; the CIoU branch matches the reference's math
term-for-term (same eps placement, same no-grad alpha) so losses built on it
are numerically comparable.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_EPS = 1e-6

# exp() of unbounded wh logits overflows once training diverges and poisons
# downstream IoUs/CIoU with NaNs (the reference shares this fragility);
# +-15 is far outside the trained regime (|wh logit| < ~3) and keeps the
# pathological case finite. One definition shared by the losses
# (train-time pbox) and ops/decode.py (serving-time boxes) so the two
# can't drift.
WH_CLAMP = 15.0


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] center-format boxes -> corner format."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - w / 2.0, cy - h / 2.0, cx + w / 2.0, cy + h / 2.0], axis=-1
    )


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] corner-format boxes -> center format."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2.0, (y1 + y2) / 2.0, x2 - x1, y2 - y1], axis=-1
    )


def xywhn_to_xyxy(boxes: jnp.ndarray, w: float, h: float, padw: float = 0.0,
                  padh: float = 0.0) -> jnp.ndarray:
    """Normalized cxcywh -> pixel xyxy (utils/general.py:560-568 semantics)."""
    cx, cy, bw, bh = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [
            w * (cx - bw / 2.0) + padw,
            h * (cy - bh / 2.0) + padh,
            w * (cx + bw / 2.0) + padw,
            h * (cy + bh / 2.0) + padh,
        ],
        axis=-1,
    )


def xyxy_to_xywhn(boxes: jnp.ndarray, w: float, h: float, clip: bool = False,
                  eps: float = 0.0) -> jnp.ndarray:
    """Pixel xyxy -> normalized cxcywh (utils/general.py:571-581 semantics)."""
    if clip:
        x1y1 = jnp.clip(boxes[..., 0:2], 0.0, jnp.array([w - eps, h - eps]))
        x2y2 = jnp.clip(boxes[..., 2:4], 0.0, jnp.array([w - eps, h - eps]))
        boxes = jnp.concatenate([x1y1, x2y2], axis=-1)
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [
            (x1 + x2) / 2.0 / w,
            (y1 + y2) / 2.0 / h,
            (x2 - x1) / w,
            (y2 - y1) / h,
        ],
        axis=-1,
    )


def box_area(boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
    return (boxes_xyxy[..., 2] - boxes_xyxy[..., 0]) * (
        boxes_xyxy[..., 3] - boxes_xyxy[..., 1]
    )


def bbox_iou(
    boxes1: jnp.ndarray,
    boxes2: jnp.ndarray,
    x1y1x2y2: bool = False,
    GIoU: bool = False,
    DIoU: bool = False,
    CIoU: bool = False,
    eps: float = _EPS,
) -> jnp.ndarray:
    """Broadcasting elementwise IoU/GIoU/DIoU/CIoU on [..., 4] boxes.

    Returns shape [..., 1], matching the reference's keepdims convention
    (utils/yolo_utils.py:88). Boxes are cxcywh unless ``x1y1x2y2``.
    """
    if x1y1x2y2:
        b1x1, b1y1, b1x2, b1y2 = jnp.split(boxes1, 4, axis=-1)
        b2x1, b2y1, b2x2, b2y2 = jnp.split(boxes2, 4, axis=-1)
    else:
        b1 = cxcywh_to_xyxy(boxes1)
        b2 = cxcywh_to_xyxy(boxes2)
        b1x1, b1y1, b1x2, b1y2 = jnp.split(b1, 4, axis=-1)
        b2x1, b2y1, b2x2, b2y2 = jnp.split(b2, 4, axis=-1)

    inter_w = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0.0, None)
    inter_h = jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0.0, None)
    inter = inter_w * inter_h

    area1 = jnp.abs((b1x2 - b1x1) * (b1y2 - b1y1))
    area2 = jnp.abs((b2x2 - b2x1) * (b2y2 - b2y1))
    union = area1 + area2 - inter + eps

    iou = inter / union

    if not (GIoU or DIoU or CIoU):
        return iou

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    if CIoU or DIoU:
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4.0
        if DIoU:
            return iou - rho2 / c2
        # CIoU aspect-ratio consistency term; alpha is treated as a constant
        # w.r.t. the gradient exactly like the reference's `with torch.no_grad()`
        # block (utils/yolo_utils.py:137-138).
        v = (4.0 / math.pi**2) * (
            jnp.arctan((b2x2 - b2x1) / (b2y2 - b2y1))
            - jnp.arctan((b1x2 - b1x1) / (b1y2 - b1y1))
        ) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1.0 + eps)))
        return iou - (rho2 / c2 + v * alpha)
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area


def pairwise_iou(boxes1_xyxy: jnp.ndarray, boxes2_xyxy: jnp.ndarray) -> jnp.ndarray:
    """All-pairs IoU: [N, 4] x [M, 4] -> [N, M] (corner format)."""
    b1 = boxes1_xyxy[:, None, :]  # [N, 1, 4]
    b2 = boxes2_xyxy[None, :, :]  # [1, M, 4]
    inter_w = jnp.clip(
        jnp.minimum(b1[..., 2], b2[..., 2]) - jnp.maximum(b1[..., 0], b2[..., 0]), 0.0
    )
    inter_h = jnp.clip(
        jnp.minimum(b1[..., 3], b2[..., 3]) - jnp.maximum(b1[..., 1], b2[..., 1]), 0.0
    )
    inter = inter_w * inter_h
    area1 = box_area(boxes1_xyxy)[:, None]
    area2 = box_area(boxes2_xyxy)[None, :]
    return inter / (area1 + area2 - inter + _EPS)


def wh_iou(wh1: jnp.ndarray, wh2: jnp.ndarray, eps: float = _EPS) -> jnp.ndarray:
    """IoU of width/height-only boxes anchored at the origin: [N,2]x[M,2]->[N,M].

    This is the anchor-matching IoU the reference computes by building
    [0, 0, w, h] corner boxes (models/loss/yolov2_loss.py:298-302).
    """
    inter = jnp.minimum(wh1[:, None, 0], wh2[None, :, 0]) * jnp.minimum(
        wh1[:, None, 1], wh2[None, :, 1]
    )
    union = (
        wh1[:, None, 0] * wh1[:, None, 1]
        + wh2[None, :, 0] * wh2[None, :, 1]
        - inter
        + eps
    )
    return inter / union
