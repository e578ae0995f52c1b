"""Vectorized YOLO grid decoding (predictions -> input-pixel boxes).

Counterparts of the reference's per-version ``decode_predictions``
(/root/reference/utils/yolov1_utils.py:12-69, yolov2_utils.py:12-58,
yolov3_utils.py:12-59) with two TPU-first differences:

* heads are NHWC ([B, H, W, A*(5+C)]) instead of NCHW, and the flattened
  candidate order is [H, W, A] instead of [A, H, W] (irrelevant downstream:
  NMS and mAP are order-free);
* everything is batched; there is no per-image loop or batch==1 assert.

Outputs are [B, H*W*A, 6] rows of ``[cx, cy, w, h, conf, class_idx]`` in
input-pixel scale, single-label class via argmax — identical semantics to the
reference. The anchor-head decoders also take ``multi_label=True`` (the
dormant Ultralytics mode): one row per (anchor, class) — [B, H*W*A*C, 6]
with ``conf = sigmoid(obj) * sigmoid(cls_c)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from podtpu.ops.boxes import WH_CLAMP


def _grid_xy(layer_h: int, layer_w: int, dtype=jnp.float32) -> jnp.ndarray:
    """[H, W, 2] grid of (x, y) cell indices."""
    ys, xs = jnp.meshgrid(
        jnp.arange(layer_h, dtype=dtype), jnp.arange(layer_w, dtype=dtype),
        indexing="ij",
    )
    return jnp.stack([xs, ys], axis=-1)


def decode_anchor_head(
    pred: jnp.ndarray,
    num_classes: int,
    anchors_grid: jnp.ndarray,
    input_size: int,
    multi_label: bool = False,
) -> jnp.ndarray:
    """Decode one anchor-grid head (YOLOv2 head or one YOLOv3/v4-tiny scale).

    Args:
      pred: [B, H, W, A*(5+C)] raw head output (NHWC).
      num_classes: C.
      anchors_grid: [A, 2] anchors in *grid units* of this layer (i.e. the
        reference's ``scaled_anchors``).
      input_size: model input resolution (pixels).
      multi_label: emit one candidate per (anchor, class) pair with
        ``conf = sigmoid(obj) * sigmoid(cls_c)`` — the reference's dormant
        Ultralytics ``multi_label`` semantics (general.py:684-692), kept
        fixed-shape by emitting all C rows and letting NMS's confidence
        mask drop the sub-threshold ones.

    Returns:
      [B, H*W*A, 6] rows ``[cx, cy, w, h, conf, cls]`` in input-pixel scale
      (``[B, H*W*A*C, 6]`` under ``multi_label``).
    """
    b, layer_h, layer_w, _ = pred.shape
    num_anchors = anchors_grid.shape[0]
    pred = pred.astype(jnp.float32).reshape(
        b, layer_h, layer_w, num_anchors, 5 + num_classes
    )
    stride_w = input_size / layer_w
    stride_h = input_size / layer_h

    grid = _grid_xy(layer_h, layer_w)[:, :, None, :]  # [H, W, 1, 2]
    pxy = jax.nn.sigmoid(pred[..., 0:2]) + grid
    # clamp keeps half-trained checkpoints from emitting inf boxes that
    # poison NMS IoUs (no effect in the trained regime, |wh logit| < ~3)
    pwh = jnp.exp(jnp.clip(pred[..., 2:4], -WH_CLAMP, WH_CLAMP)) * anchors_grid[None, None, :, :]
    pbox = jnp.concatenate([pxy, pwh], axis=-1) * jnp.array(
        [stride_w, stride_h, stride_w, stride_h], dtype=jnp.float32
    )
    if multi_label:
        c = num_classes
        conf = (jax.nn.sigmoid(pred[..., 4:5])
                * jax.nn.sigmoid(pred[..., 5:]))  # [B,H,W,A,C]
        shape = (b, layer_h, layer_w, num_anchors, c)
        box = jnp.broadcast_to(pbox[..., None, :], shape + (4,))
        cls = jnp.broadcast_to(
            jnp.arange(c, dtype=jnp.float32), shape)
        out = jnp.concatenate(
            [box, conf[..., None], cls[..., None]], axis=-1)
        return out.reshape(b, layer_h * layer_w * num_anchors * c, 6)
    pconf = jax.nn.sigmoid(pred[..., 4:5])
    # argmax(sigmoid(x)) == argmax(x): skip the elementwise sigmoid the
    # reference applies before its argmax (yolov3_utils.py:51,57).
    pcls = jnp.argmax(pred[..., 5:], axis=-1, keepdims=True).astype(jnp.float32)
    out = jnp.concatenate([pbox, pconf, pcls], axis=-1)
    return out.reshape(b, layer_h * layer_w * num_anchors, 6)


def decode_yolov2(pred, num_classes, scaled_anchors, input_size,
                  multi_label=False):
    """YOLOv2: single 13x13 head; ``scaled_anchors`` are already grid units."""
    anchors = jnp.asarray(scaled_anchors, dtype=jnp.float32)
    return decode_anchor_head(pred, num_classes, anchors, input_size,
                              multi_label=multi_label)


def decode_yolov3(preds, num_classes, anchors, input_size, multi_label=False):
    """YOLOv3/v4-tiny: decode [p3, p4, p5]; global ``anchors`` are in input
    pixels, split 3-per-layer and rescaled to each layer's grid units
    (yolov3_utils.py:29-31,76-84)."""
    anchors = jnp.asarray(anchors, dtype=jnp.float32)
    outs = []
    for idx, pred in enumerate(preds):
        layer_h, layer_w = pred.shape[1], pred.shape[2]
        stride_w = input_size / layer_w
        stride_h = input_size / layer_h
        layer_anchors = anchors[3 * idx : 3 * idx + 3] / jnp.array(
            [stride_w, stride_h], dtype=jnp.float32
        )
        outs.append(decode_anchor_head(pred, num_classes, layer_anchors,
                                       input_size, multi_label=multi_label))
    return jnp.concatenate(outs, axis=1)


def decode_yolov1(pred, num_classes, num_boxes, input_size, grid_size: int = 7):
    """YOLOv1: [B, S*S*(5B+C)] fully-connected head.

    Per cell, pick the box with the best (sigmoided) confidence
    (yolov1_utils.py:38-54); w/h are normalized to the full image.
    """
    s = grid_size
    b = pred.shape[0]
    p = jax.nn.sigmoid(
        pred.astype(jnp.float32).reshape(b, s, s, num_boxes * 5 + num_classes)
    )
    stride = input_size / s

    boxes = p[..., num_classes:].reshape(b, s, s, num_boxes, 5)  # [conf, x, y, w, h]
    conf = boxes[..., 0]  # [B, S, S, NB]
    best_onehot = jax.nn.one_hot(jnp.argmax(conf, axis=-1), num_boxes)

    pbox = jnp.sum(best_onehot[..., None] * boxes[..., 1:5], axis=-2)  # [B,S,S,4]
    pconf = jnp.sum(best_onehot * conf, axis=-1, keepdims=True)  # [B,S,S,1]

    grid = _grid_xy(s, s)
    pxy = (pbox[..., 0:2] + grid) * stride
    pwh = pbox[..., 2:4] * jnp.array([s, s], dtype=jnp.float32) * stride
    pcls = jnp.argmax(p[..., :num_classes], axis=-1, keepdims=True).astype(jnp.float32)
    out = jnp.concatenate([pxy, pwh, pconf, pcls], axis=-1)
    return out.reshape(b, s * s, 6)
