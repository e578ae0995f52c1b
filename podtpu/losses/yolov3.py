"""YOLOv3 / YOLOv4-tiny losses (vectorized port of models/loss/yolov3_loss.py).

Three variants, matching the reference:

* ``yolov3_loss``     — per-coordinate MSE box term (yolov3_loss.py:17-196);
* ``yolov3_loss_v2``  — the ACTIVE recipe (module/yolov3_detector.py:16):
  CIoU box x10, MSE obj x5, MSE noobj x1, BCE class x1 with label smoothing
  smooth_BCE(0.01) (yolov3_loss.py:199-362);
* ``yolov3_loss_v3``  — experimental BCE obj/noobj split with
  ignore-as-positive tconf (yolov3_loss.py:365-539).

A GT is assigned to a layer only when its globally-best anchor (argmax of
wh-IoU over all 9 anchors in input pixels) falls in that layer's triplet; the
per-layer ignore mask uses the triplet's local IoUs (yolov3_loss.py:331-352).

Inputs: list of NHWC raw logits [p3, p4, p5] and padded annotations [B,T,5].
"""

from __future__ import annotations

import jax.numpy as jnp

from podtpu.losses.common import (
    bce_logits,
    masked_ciou_loss,
    masked_sum,
    sigmoid,
    smooth_bce,
)
from podtpu.ops.assign import encode_anchor_targets
from podtpu.ops.boxes import WH_CLAMP as _WH_CLAMP


def _layer_targets(target, num_classes, anchors, input_size, layer_idx, layer_w,
                   layer_h, ignore_threshold, cls_pos=1.0, cls_neg=0.0,
                   cls_accumulate=False):
    anchors = jnp.asarray(anchors, dtype=jnp.float32)
    lo, hi = 3 * layer_idx, 3 * layer_idx + 3
    scaled = anchors[lo:hi] * jnp.array(
        [layer_w / input_size, layer_h / input_size], dtype=jnp.float32
    )
    return encode_anchor_targets(
        target,
        num_classes,
        scaled,
        layer_w,
        layer_h,
        ignore_threshold,
        match_anchors=anchors,
        layer_anchor_slice=(lo, hi),
        match_scale=(float(input_size), float(input_size)),
        cls_pos=cls_pos,
        cls_neg=cls_neg,
        cls_accumulate=cls_accumulate,
    )


def _split(pred, num_classes):
    b, h, w, _ = pred.shape
    p = pred.astype(jnp.float32).reshape(b, h, w, 3, 5 + num_classes)
    return p[..., 0:2], p[..., 2:4], p[..., 4], p[..., 5:]


def yolov3_loss_v2(
    preds,
    target,
    num_classes: int,
    anchors,
    input_size: int,
    ignore_threshold: float = 0.5,
    lambda_obj: float = 5.0,
    lambda_noobj: float = 1.0,
    lambda_coord: float = 10.0,
    lambda_class: float = 1.0,
    label_smoothing: float = 0.01,
) -> jnp.ndarray:
    """Active YOLOv3 recipe (CIoU + label smoothing)."""
    cls_pos, cls_neg = smooth_bce(label_smoothing)
    b = preds[0].shape[0]
    loss = 0.0
    for layer_idx, pred in enumerate(preds):
        h, w = pred.shape[1], pred.shape[2]
        xy, wh, conf, cls = _split(pred, num_classes)
        t = _layer_targets(
            target, num_classes, anchors, input_size, layer_idx, w, h,
            ignore_threshold, cls_pos, cls_neg,
        )

        pbox = jnp.concatenate([sigmoid(xy), jnp.exp(jnp.clip(wh, -_WH_CLAMP, _WH_CLAMP))], axis=-1)
        box_loss = lambda_coord * masked_ciou_loss(pbox, t.tbox, t.mask)

        pconf = sigmoid(conf)
        object_loss = lambda_obj * jnp.sum((pconf * t.mask - t.tconf) ** 2)
        no_object_loss = lambda_noobj * jnp.sum((pconf * t.noobj_mask) ** 2)
        class_loss = lambda_class * masked_sum(bce_logits(cls, t.tcls), t.mask)

        loss = loss + box_loss + object_loss + no_object_loss + class_loss
    return loss / b


def yolov3_loss(
    preds,
    target,
    num_classes: int,
    anchors,
    input_size: int,
    ignore_threshold: float = 0.5,
    lambda_obj: float = 5.0,
    lambda_noobj: float = 1.0,
    lambda_coord: float = 1.0,
    lambda_class: float = 1.0,
) -> jnp.ndarray:
    """Original per-coordinate MSE variant."""
    b = preds[0].shape[0]
    loss = 0.0
    for layer_idx, pred in enumerate(preds):
        h, w = pred.shape[1], pred.shape[2]
        xy, wh, conf, cls = _split(pred, num_classes)
        t = _layer_targets(
            target, num_classes, anchors, input_size, layer_idx, w, h,
            ignore_threshold,
            # unsmoothed reference writes: class bits accumulate on
            # same-slot collisions (yolov3_loss.py:190 — no row reset;
            # the v2/v3 variants reset the row: 359-360, 535-536)
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

        loss = loss + box_loss + object_loss + no_object_loss + class_loss
    return loss / b


def yolov3_loss_v3(
    preds,
    target,
    num_classes: int,
    anchors,
    input_size: int,
    ignore_threshold: float = 0.5,
    lambda_obj: float = 5.0,
    lambda_box: float = 1.0,
    lambda_cls: float = 1.0,
) -> jnp.ndarray:
    """Experimental BCE-objectness variant (yolov3_loss.py:365-539).

    tconf is 1 at the assigned anchor AND at ignore (IoU > threshold)
    anchors of the GT cell; the no-object BCE covers tconf == 0.
    """
    b = preds[0].shape[0]
    lbox = lobj = lcls = lnobj = 0.0
    for layer_idx, pred in enumerate(preds):
        h, w = pred.shape[1], pred.shape[2]
        xy, wh, conf, cls = _split(pred, num_classes)
        t = _layer_targets(
            target, num_classes, anchors, input_size, layer_idx, w, h,
            ignore_threshold,
        )
        # tconf with ignore-as-positive: assigned ∪ above-threshold anchors.
        # (mask only ever sets 1s; noobj_mask only ever clears — so their
        # union reproduces the sequential writes exactly.)
        tconf = jnp.maximum(t.mask, 1.0 - t.noobj_mask)

        pbox = jnp.concatenate([sigmoid(xy), jnp.exp(jnp.clip(wh, -_WH_CLAMP, _WH_CLAMP))], axis=-1)
        lbox = lbox + masked_ciou_loss(pbox, t.tbox, t.mask)
        lobj = lobj + masked_sum(bce_logits(conf, jnp.ones_like(conf)), tconf)
        lcls = lcls + masked_sum(bce_logits(cls, t.tcls), t.mask)
        lnobj = lnobj + masked_sum(bce_logits(conf, jnp.zeros_like(conf)), 1.0 - tconf)

    return (lambda_box * lbox + lambda_obj * lobj + lambda_cls * lcls + lnobj) / b
