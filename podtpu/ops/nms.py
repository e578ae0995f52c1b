"""Fixed-shape, device-resident class-aware NMS.

The reference runs ``torchvision.ops.batched_nms`` per image after a dynamic
confidence filter (utils/yolo_utils.py:321-348) — a GPU->CPU sync per image.
On TPU, dynamic shapes force recompiles and host round-trips, so this
implementation is a padded, statically-shaped pipeline that XLA compiles once:

  1. scores below ``conf_threshold`` are masked (set to -1) instead of
     filtered;
  2. top-k prefilter keeps the best K candidates;
  3. class-aware greedy suppression: same-class boxes only (the
     ``batched_nms`` semantics) via a per-class coordinate offset;
  4. output is a fixed [max_det, 6] buffer + a validity mask, sorted by
     descending confidence (torchvision returns keep-indices in score order,
     so downstream semantics match).

Suppression keeps a box iff no higher-scored *kept* box of the same class
overlaps it above ``iou_threshold`` — exactly greedy NMS, computed with a
sequential ``fori_loop`` over the K candidates (K is small; each step is a
K-wide vector op on the VPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from podtpu.ops.boxes import cxcywh_to_xyxy, pairwise_iou

# Larger than any pixel coordinate we will ever see; used to separate classes
# so cross-class IoU is exactly 0.
_CLASS_OFFSET = 8192.0


@functools.partial(jax.jit, static_argnames=("top_k", "max_detections"))
def nms_padded(
    boxes: jnp.ndarray,
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    top_k: int = 512,
    max_detections: int = 100,
):
    """Greedy class-aware NMS on one image's candidates.

    Args:
      boxes: [N, 6] rows ``[cx, cy, w, h, conf, cls]`` (decode output).
      conf_threshold: candidates at or below this are dropped (reference uses
        strict ``conf > threshold``: yolo_utils.py:334).
      iou_threshold: suppression IoU.
      top_k: static prefilter size.
      max_detections: static output size.

    Returns:
      (out, valid): out is [max_detections, 6] sorted by descending conf with
      zero padding; valid is [max_detections] bool.
    """
    n = boxes.shape[0]
    k = min(top_k, n)

    conf = boxes[:, 4]
    score = jnp.where(conf > conf_threshold, conf, -1.0)
    top_scores, top_idx = jax.lax.top_k(score, k)
    cand = boxes[top_idx]  # [K, 6] sorted by masked score desc
    cand_valid = top_scores > 0.0

    xyxy = cxcywh_to_xyxy(cand[:, 0:4])
    # Shift each class into its own disjoint coordinate region so one IoU
    # matrix implements class-aware suppression. The stride must exceed the
    # full coordinate span — untrained heads can emit exp() boxes far larger
    # than the image, so derive it from the data like torchvision does.
    span = jnp.maximum(jnp.max(jnp.abs(xyxy)), _CLASS_OFFSET) * 2.0 + 1.0
    offset = cand[:, 5:6] * span
    iou = pairwise_iou(xyxy + offset, xyxy + offset)  # [K, K]

    suppress = (iou > iou_threshold) & ~jnp.eye(k, dtype=bool)

    def body(i, keep):
        # If candidate i is still alive, it is kept and kills its overlaps.
        alive = keep[i]
        return jnp.where(alive, keep & ~suppress[i], keep)

    keep = jax.lax.fori_loop(0, k, body, cand_valid)

    # Gather kept boxes (already score-sorted) into the fixed output buffer.
    kept_score = jnp.where(keep, cand[:, 4], -1.0)
    out_scores, out_idx = jax.lax.top_k(kept_score, min(max_detections, k))
    out = cand[out_idx]
    valid = out_scores > 0.0
    if max_detections > k:
        pad = max_detections - k
        out = jnp.pad(out, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    out = jnp.where(valid[:, None], out, 0.0)
    return out, valid


@functools.partial(jax.jit, static_argnames=("top_k", "max_detections"))
def batched_class_aware_nms(
    boxes: jnp.ndarray,
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    top_k: int = 512,
    max_detections: int = 100,
):
    """vmap of :func:`nms_padded` over the batch: [B, N, 6] -> ([B, M, 6], [B, M])."""
    return jax.vmap(
        lambda b: nms_padded(b, conf_threshold, iou_threshold, top_k, max_detections)
    )(boxes)
