"""YOLOv2 losses (vectorized port of models/loss/yolov2_loss.py semantics).

Both variants share the anchor-grid target encoding; ``yolov2_loss_v2`` is
the variant actually trained in the reference (module/yolov2_detector.py:14):
CIoU box term x0.5, MSE objectness x5, MSE no-object x1, BCE class x1, all
sum-reduced and divided by batch size.

Inputs are NHWC raw logits [B, H, W, A*(5+C)] and padded annotations
[B, T, 5]; the whole computation is device-resident (the reference builds its
targets on CPU each step: yolov2_loss.py:223-229).
"""

from __future__ import annotations

import jax.numpy as jnp

from podtpu.losses.common import bce_logits, masked_ciou_loss, masked_sum, sigmoid
from podtpu.ops.assign import encode_anchor_targets
from podtpu.ops.boxes import WH_CLAMP as _WH_CLAMP


def _split_pred(pred: jnp.ndarray, num_anchors: int, num_classes: int):
    b, h, w, _ = pred.shape
    p = pred.astype(jnp.float32).reshape(b, h, w, num_anchors, 5 + num_classes)
    return p[..., 0:2], p[..., 2:4], p[..., 4], p[..., 5:]  # xy, wh, conf, cls logits


def yolov2_loss_v2(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    num_classes: int,
    scaled_anchors,
    ignore_threshold: float = 0.5,
    lambda_obj: float = 5.0,
    lambda_noobj: float = 1.0,
    lambda_coord: float = 0.5,
    lambda_class: float = 1.0,
) -> jnp.ndarray:
    """Active YOLOv2 loss (CIoU box term): yolov2_loss.py:174-258."""
    anchors = jnp.asarray(scaled_anchors, dtype=jnp.float32)
    num_anchors = anchors.shape[0]
    b, h, w, _ = pred.shape
    xy, wh, conf, cls = _split_pred(pred, num_anchors, num_classes)

    t = encode_anchor_targets(
        target, num_classes, anchors, w, h, ignore_threshold,
        # unsmoothed reference writes: class bits accumulate on same-slot
        # collisions (yolov2_loss.py:165,309 — no row reset)
        cls_accumulate=True,
    )

    pbox = jnp.concatenate([sigmoid(xy), jnp.exp(jnp.clip(wh, -_WH_CLAMP, _WH_CLAMP))], axis=-1)
    box_loss = lambda_coord * masked_ciou_loss(pbox, t.tbox, t.mask)

    pconf = sigmoid(conf)
    object_loss = lambda_obj * jnp.sum((pconf * t.mask - t.tconf) ** 2)
    no_object_loss = lambda_noobj * jnp.sum((pconf * t.noobj_mask) ** 2)

    class_loss = lambda_class * masked_sum(bce_logits(cls, t.tcls), t.mask)

    return (box_loss + object_loss + no_object_loss + class_loss) / b


def yolov2_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    num_classes: int,
    scaled_anchors,
    ignore_threshold: float = 0.5,
    lambda_obj: float = 5.0,
    lambda_noobj: float = 1.0,
    lambda_coord: float = 1.0,
    lambda_class: float = 1.0,
) -> jnp.ndarray:
    """Original per-coordinate MSE variant: yolov2_loss.py:16-105."""
    anchors = jnp.asarray(scaled_anchors, dtype=jnp.float32)
    num_anchors = anchors.shape[0]
    b, h, w, _ = pred.shape
    xy, wh, conf, cls = _split_pred(pred, num_anchors, num_classes)

    t = encode_anchor_targets(
        target, num_classes, anchors, w, h, ignore_threshold,
        # unsmoothed reference writes: class bits accumulate on same-slot
        # collisions (yolov2_loss.py:165,309 — no row reset)
        cls_accumulate=True,
    )

    pxy = sigmoid(xy)
    pwh = jnp.exp(jnp.clip(wh, -_WH_CLAMP, _WH_CLAMP))
    box_loss = lambda_coord * (
        jnp.sum((pxy[..., 0] * t.mask - t.tbox[..., 0]) ** 2)
        + jnp.sum((pxy[..., 1] * t.mask - t.tbox[..., 1]) ** 2)
        + jnp.sum((pwh[..., 0] * t.mask - t.tbox[..., 2]) ** 2)
        + jnp.sum((pwh[..., 1] * t.mask - t.tbox[..., 3]) ** 2)
    )

    pconf = sigmoid(conf)
    object_loss = lambda_obj * jnp.sum((pconf * t.mask - t.tconf) ** 2)
    no_object_loss = lambda_noobj * jnp.sum((pconf * t.noobj_mask) ** 2)
    class_loss = lambda_class * masked_sum(bce_logits(cls, t.tcls), t.mask)

    return (box_loss + object_loss + no_object_loss + class_loss) / b
