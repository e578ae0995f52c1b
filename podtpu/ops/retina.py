"""RetinaNet anchors, target assignment, loss, and decode (TPU-first).

All fixed-shape and fully vectorized: assignment is one [B, A, T] IoU tensor
per batch (A ≈ 32k anchors at 416², T = max_annots), per-anchor max over GTs
— no sequential scan is needed because RetinaNet assigns each ANCHOR its
best GT (IoU >= 0.5 positive, < 0.4 negative, in between ignored), unlike
YOLO's per-GT writes.

Anchor layout per level: 3 octave scales (2^0, 2^(1/3), 2^(2/3)) x 3 aspect
ratios (0.5, 1, 2), base size 4x the stride. Box regression uses the
standard (dx, dy, dw, dh) parameterization relative to the anchor.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from podtpu.losses.common import bce_logits
from podtpu.ops.boxes import WH_CLAMP

OCTAVES = (0.0, 1.0 / 3.0, 2.0 / 3.0)
RATIOS = (0.5, 1.0, 2.0)
POS_IOU = 0.5
NEG_IOU = 0.4


def level_anchors(stride: int, h: int, w: int) -> jnp.ndarray:
    """[H*W*9, 4] cxcywh anchors for one pyramid level (input-pixel scale)."""
    base = 4.0 * stride
    shapes = []
    for octave in OCTAVES:
        size = base * (2.0 ** octave)
        for ratio in RATIOS:
            aw = size * math.sqrt(1.0 / ratio)
            ah = size * math.sqrt(ratio)
            shapes.append((aw, ah))
    shapes = jnp.asarray(shapes, jnp.float32)  # [9, 2]
    ys, xs = jnp.meshgrid(
        (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride,
        (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride,
        indexing="ij",
    )
    centers = jnp.stack([xs, ys], axis=-1).reshape(-1, 1, 2)  # [HW, 1, 2]
    wh = jnp.broadcast_to(shapes[None], (h * w, 9, 2))
    anchors = jnp.concatenate(
        [jnp.broadcast_to(centers, (h * w, 9, 2)), wh], axis=-1
    )
    return anchors.reshape(-1, 4)


def all_anchors(input_size: int, strides: Sequence[int]) -> jnp.ndarray:
    """[A_total, 4] anchors across the pyramid.

    Level sizes use CEILING division: each stride-2 conv in the backbone/
    P6/P7 chain computes ``ceil(h/2)`` (k3 s2 pad1), and iterated ceil
    halving equals ``ceil(input/stride)`` — floor division under-counts
    P6/P7 whenever the input is not divisible by 128 (e.g. 64px: P7 is 1x1,
    not 0x0)."""
    parts = []
    for s in strides:
        hw = -(-input_size // s)
        parts.append(level_anchors(s, hw, hw))
    return jnp.concatenate(parts, axis=0)


def _iou_cxcywh(anchors: jnp.ndarray, gts: jnp.ndarray) -> jnp.ndarray:
    """[A, 4] x [T, 4] center-format -> [A, T] IoU."""
    ax1 = anchors[:, None, 0] - anchors[:, None, 2] / 2
    ay1 = anchors[:, None, 1] - anchors[:, None, 3] / 2
    ax2 = anchors[:, None, 0] + anchors[:, None, 2] / 2
    ay2 = anchors[:, None, 1] + anchors[:, None, 3] / 2
    bx1 = gts[None, :, 0] - gts[None, :, 2] / 2
    by1 = gts[None, :, 1] - gts[None, :, 3] / 2
    bx2 = gts[None, :, 0] + gts[None, :, 2] / 2
    by2 = gts[None, :, 1] + gts[None, :, 3] / 2
    iw = jnp.clip(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    ih = jnp.clip(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = iw * ih
    union = ((ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1)
             - inter + 1e-6)
    return inter / union


def assign_targets(anchors: jnp.ndarray, target: jnp.ndarray,
                   num_classes: int, input_size: int):
    """Per-image anchor assignment.

    Args:
      anchors: [A, 4] cxcywh pixels.
      target: [T, 5] normalized padded annotations.

    Returns (cls_t [A, C], box_t [A, 4] deltas, pos [A], valid [A]):
      pos = anchor has a GT; valid = contributes to the class loss
      (positives + confident negatives; the 0.4-0.5 band is ignored).
    """
    gt_valid = jnp.sum(target, axis=-1) > 0  # [T]
    boxes = target[:, :4] * input_size  # cxcywh pixels
    cls = jnp.clip(target[:, 4].astype(jnp.int32), 0, num_classes - 1)

    iou = _iou_cxcywh(anchors, boxes)  # [A, T]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)  # [A]
    best_iou = jnp.max(iou, axis=1)

    pos = best_iou >= POS_IOU
    neg = (best_iou < NEG_IOU)
    valid = pos | neg

    gt_box = boxes[best_gt]  # [A, 4]
    gt_cls = cls[best_gt]

    # box deltas (dx, dy, dw, dh) w.r.t. anchor
    eps = 1e-6
    dxy = (gt_box[:, 0:2] - anchors[:, 0:2]) / (anchors[:, 2:4] + eps)
    dwh = jnp.log(jnp.clip(gt_box[:, 2:4], 1.0, None) / (anchors[:, 2:4] + eps))
    box_t = jnp.concatenate([dxy, dwh], axis=-1)

    cls_t = jax.nn.one_hot(gt_cls, num_classes, dtype=jnp.float32)
    cls_t = jnp.where(pos[:, None], cls_t, 0.0)
    return cls_t, box_t, pos.astype(jnp.float32), valid.astype(jnp.float32)


def _flatten_heads(outputs, num_classes: int):
    """List of (cls [B,H,W,A*C], box [B,H,W,A*4]) -> ([B,A_tot,C], [B,A_tot,4])."""
    cls_list, box_list = [], []
    for cls, box in outputs:
        b, h, w, _ = cls.shape
        cls_list.append(cls.reshape(b, h * w * 9, num_classes))
        box_list.append(box.reshape(b, h * w * 9, 4))
    return (jnp.concatenate(cls_list, axis=1).astype(jnp.float32),
            jnp.concatenate(box_list, axis=1).astype(jnp.float32))


def retinanet_loss(outputs, target, num_classes: int, input_size: int,
                   strides=(8, 16, 32, 64, 128), alpha: float = 0.25,
                   gamma: float = 2.0, box_weight: float = 1.0):
    """Focal class loss (normalized by #positives) + smooth-L1 box loss."""
    anchors = all_anchors(input_size, strides)
    cls_p, box_p = _flatten_heads(outputs, num_classes)
    b = cls_p.shape[0]

    cls_t, box_t, pos, valid = jax.vmap(
        lambda t: assign_targets(anchors, t, num_classes, input_size)
    )(target.astype(jnp.float32))

    # focal loss on valid anchors
    p = jax.nn.sigmoid(cls_p)
    ce = bce_logits(cls_p, cls_t)
    p_t = p * cls_t + (1.0 - p) * (1.0 - cls_t)
    alpha_t = alpha * cls_t + (1.0 - alpha) * (1.0 - cls_t)
    focal = alpha_t * (1.0 - p_t) ** gamma * ce
    cls_loss = jnp.sum(focal * valid[..., None])

    # smooth-L1 on positive anchors
    diff = jnp.abs(box_p - box_t)
    sl1 = jnp.where(diff < 1.0 / 9.0, 4.5 * diff**2, diff - 1.0 / 18.0)
    box_loss = jnp.sum(sl1 * pos[..., None]) * box_weight

    num_pos = jnp.maximum(jnp.sum(pos), 1.0)
    return (cls_loss + box_loss) / num_pos


def decode_retinanet(outputs, num_classes: int, input_size: int,
                     strides=(8, 16, 32, 64, 128)) -> jnp.ndarray:
    """Heads -> [B, A_tot, 6] rows [cx, cy, w, h, conf, cls] (pixel scale)."""
    anchors = all_anchors(input_size, strides)
    cls_p, box_p = _flatten_heads(outputs, num_classes)
    probs = jax.nn.sigmoid(cls_p)
    conf = jnp.max(probs, axis=-1, keepdims=True)
    cls = jnp.argmax(probs, axis=-1, keepdims=True).astype(jnp.float32)

    cxy = anchors[None, :, 0:2] + box_p[..., 0:2] * anchors[None, :, 2:4]
    wh = (jnp.exp(jnp.clip(box_p[..., 2:4], -WH_CLAMP, WH_CLAMP))
          * anchors[None, :, 2:4])
    return jnp.concatenate([cxy, wh, conf, cls], axis=-1)
