"""YOLOv1 loss (vectorized port of models/loss/yolov1_loss.py semantics).

The whole [B, 7, 7, 5B+C] prediction is sigmoided; per cell, the predicted
box with the best IoU against the (single) GT box is "responsible"
(yolov1_loss.py:54-77). Sum-reduced MSE coord term x5, objectness MSE toward
the responsible box's IoU, no-object MSE x0.5, BCE class on occupied cells,
divided by batch.

Reference quirk preserved: the IoU mixes scales — xy are cell-offsets in
[0, 1), wh are image-normalized (yolov1_loss.py:57-60, 143).
"""

from __future__ import annotations

import jax.numpy as jnp

from podtpu.losses.common import bce_logits, masked_sum, sigmoid
from podtpu.ops.assign import encode_yolov1_targets
from podtpu.ops.boxes import bbox_iou


def yolov1_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    num_classes: int,
    num_boxes: int,
    grid_size: int = 7,
    lambda_obj: float = 1.0,
    lambda_noobj: float = 0.5,
    lambda_coord: float = 5.0,
    lambda_class: float = 1.0,
) -> jnp.ndarray:
    s = grid_size
    b = pred.shape[0]
    logits = pred.astype(jnp.float32).reshape(b, s, s, num_boxes * 5 + num_classes)
    y_pred = sigmoid(logits)

    t = encode_yolov1_targets(target, num_classes, s)

    # [B, S, S, NB, 5]: (conf, x, y, w, h) per predicted box
    pboxes = y_pred[..., num_classes:].reshape(b, s, s, num_boxes, 5)
    ious = bbox_iou(t.tbox[..., None, :], pboxes[..., 1:5])[..., 0]  # [B,S,S,NB]

    best = jnp.argmax(ious, axis=-1)  # [B, S, S]
    onehot = (best[..., None] == jnp.arange(num_boxes)).astype(jnp.float32)

    pbox = jnp.sum(onehot[..., None] * pboxes[..., 1:5], axis=-2)  # [B,S,S,4]
    pconf = jnp.sum(onehot * pboxes[..., 0], axis=-1)  # [B,S,S]
    piou = jnp.sum(onehot * ious, axis=-1)  # [B,S,S]

    mask = t.mask  # [B,S,S]
    noobj = 1.0 - mask

    box_loss = lambda_coord * jnp.sum((pbox * mask[..., None] - t.tbox) ** 2)
    object_loss = lambda_obj * jnp.sum((pconf * mask - piou) ** 2)
    no_object_loss = lambda_noobj * jnp.sum((pconf * noobj) ** 2)
    class_loss = lambda_class * masked_sum(
        bce_logits(logits[..., :num_classes], t.tcls), mask
    )

    return (box_loss + object_loss + no_object_loss + class_loss) / b
