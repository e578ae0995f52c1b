"""Fixed-shape, device-resident class-aware NMS.

The reference runs ``torchvision.ops.batched_nms`` per image after a dynamic
confidence filter (utils/yolo_utils.py:321-348) — a GPU->CPU sync per image.
On TPU, dynamic shapes force recompiles and host round-trips, so this
implementation is a padded, statically-shaped three-stage pipeline that XLA
compiles once:

  1. **select**: scores at/below ``conf_threshold`` are masked (set to -1)
     instead of filtered, then a top-k keeps the best K candidates;
  2. **suppress**: greedy class-aware suppression — a box survives iff no
     higher-scored surviving box of the same class overlaps it above
     ``iou_threshold`` (exactly ``batched_nms`` semantics, via a per-class
     coordinate offset). Two backends: a Pallas TPU kernel that fuses the
     IoU matrix + sequential loop in VMEM (podtpu/ops/pallas/nms_kernel.py),
     and a plain XLA ``fori_loop``;
  3. **finalize**: survivors gathered into a fixed [max_det, 6] buffer +
     validity mask, sorted by descending confidence (torchvision returns
     keep-indices in score order, so downstream semantics match).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from podtpu.ops.boxes import cxcywh_to_xyxy, pairwise_iou

# Floor for the class-separation stride (see _select_candidates).
_CLASS_OFFSET = 8192.0

_STATIC = ("conf_threshold", "iou_threshold", "top_k", "max_detections",
           "backend", "agnostic", "merge", "classes")


_BACKENDS = ("xla", "xla_early", "pallas", "pallas_interpret")


def _default_backend() -> str:
    """Suppression backend. Override with
    ``PODTPU_NMS_BACKEND=xla|xla_early|pallas``.

    ``xla_early`` (default) = data-dependent trip count + lazy IoU rows;
    bit-identical keeps to the dense loop, measured +11.8% on trained-score
    distributions / neutral on uniform scores (RESULTS.md round-11, v5e).
    ``xla`` = dense fori_loop; the Pallas kernel fuses the IoU matrix +
    loop in VMEM on TPU (measured slower on v5e — scaffold).
    """
    import os

    env = os.environ.get("PODTPU_NMS_BACKEND")
    if env:
        return env
    return "xla_early"


def _select_candidates(boxes: jnp.ndarray, conf_threshold: float, top_k: int,
                       agnostic: bool = False,
                       classes: tuple[int, ...] | None = None):
    """[N, 6] -> (cand [K, 6], cand_valid [K], offset_boxes [K, 4])."""
    n = boxes.shape[0]
    k = min(top_k, n)
    conf = boxes[:, 4]
    score = jnp.where(conf > conf_threshold, conf, -1.0)
    if classes is not None:
        # class filter (the reference's `classes=` option, general.py:697-698)
        allowed = jnp.isin(boxes[:, 5],
                           jnp.asarray(classes, dtype=boxes.dtype))
        score = jnp.where(allowed, score, -1.0)
    top_scores, top_idx = jax.lax.top_k(score, k)
    cand = boxes[top_idx]
    cand_valid = top_scores > 0.0

    xyxy = cxcywh_to_xyxy(cand[:, 0:4])
    if agnostic:
        # class-agnostic suppression (general.py:712 `agnostic` -> offset 0)
        return cand, cand_valid, xyxy
    # Shift each class into its own disjoint coordinate region so one IoU
    # matrix implements class-aware suppression. The stride must exceed the
    # full coordinate span — untrained heads can emit exp() boxes far larger
    # than the image, so derive it from the data like torchvision does.
    span = jnp.maximum(jnp.max(jnp.abs(xyxy)), _CLASS_OFFSET) * 2.0 + 1.0
    offset_boxes = xyxy + cand[:, 5:6] * span
    return cand, cand_valid, offset_boxes


def _xla_suppress(offset_boxes: jnp.ndarray, cand_valid: jnp.ndarray,
                  iou_threshold: float) -> jnp.ndarray:
    k = offset_boxes.shape[0]
    iou = pairwise_iou(offset_boxes, offset_boxes)
    suppress = (iou > iou_threshold) & ~jnp.eye(k, dtype=bool)

    def body(i, keep):
        alive = keep[i]
        return jnp.where(alive, keep & ~suppress[i], keep)

    return jax.lax.fori_loop(0, k, body, cand_valid)


def _xla_suppress_early(offset_boxes: jnp.ndarray, cand_valid: jnp.ndarray,
                        iou_threshold: float) -> jnp.ndarray:
    """Batched greedy suppression with a data-dependent trip count.

    Candidates are score-sorted, so every index at/past the per-image valid
    count has ``keep`` False from the start and its loop iteration is a
    no-op — the loop therefore only needs to run to the LARGEST valid count
    in the batch (a ``while_loop``; no recompile, the bound is data). IoU
    rows are computed lazily per iteration instead of materializing the
    [B, K, K] matrix, so the work drops from O(K²) to O(kmax·K) pairwise
    terms. On a trained model at serving thresholds kmax is tens, not
    top_k=512. Bit-identical keeps to :func:`_xla_suppress` (same formula,
    same order; the skipped iterations are provably no-ops).
    """
    b, k, _ = offset_boxes.shape
    kmax = jnp.max(jnp.sum(cand_valid.astype(jnp.int32), axis=1))
    idx = jnp.arange(k)

    def cond(carry):
        i, _ = carry
        return i < kmax

    def body(carry):
        i, keep = carry
        box_i = jax.lax.dynamic_slice_in_dim(offset_boxes, i, 1, axis=1)
        iou_row = jax.vmap(pairwise_iou)(box_i, offset_boxes)[:, 0]  # [B, K]
        suppress_row = (iou_row > iou_threshold) & (idx != i)[None, :]
        alive = jax.lax.dynamic_slice_in_dim(keep, i, 1, axis=1)  # [B, 1]
        keep = jnp.where(alive, keep & ~suppress_row, keep)
        return i + 1, keep

    _, keep = jax.lax.while_loop(cond, body, (jnp.asarray(0), cand_valid))
    return keep


def _merge_kept(cand: jnp.ndarray, cand_valid: jnp.ndarray,
                offset_boxes: jnp.ndarray, keep: jnp.ndarray,
                iou_threshold: float):
    """Merge-NMS (general.py:714-721): each survivor becomes the
    score-weighted mean of every candidate overlapping it above the IoU
    threshold (same-class overlap — the IoU runs on offset boxes), and
    survivors without a second contributor are dropped (``redundant``).
    The weighted mean runs on cxcywh directly: it is linear in xyxy, so the
    result equals the reference's xyxy-space average. Matches the
    reference's ``1 < n`` gate (a single candidate is returned unmerged);
    its ``n < 3E3`` upper gate is a CPU-time guard with no analog here —
    one [K, K] matmul is the point of the TPU formulation."""
    iou = pairwise_iou(offset_boxes, offset_boxes) > iou_threshold
    contrib = iou & cand_valid[None, :]
    w = contrib * jnp.where(cand_valid, cand[:, 4], 0.0)[None, :]
    merged = (w @ cand[:, 0:4]) / jnp.maximum(
        jnp.sum(w, axis=1, keepdims=True), 1e-12)
    do = (jnp.sum(cand_valid) > 1) & keep
    boxes4 = jnp.where(do[:, None], merged, cand[:, 0:4])
    keep = keep & jnp.where(jnp.sum(cand_valid) > 1,
                            jnp.sum(contrib, axis=1) > 1, True)
    return jnp.concatenate([boxes4, cand[:, 4:]], axis=1), keep


def _finalize(cand: jnp.ndarray, keep: jnp.ndarray, max_detections: int):
    k = cand.shape[0]
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


@functools.partial(jax.jit, static_argnames=_STATIC)
def batched_class_aware_nms(
    boxes: jnp.ndarray,
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    top_k: int = 512,
    max_detections: int = 100,
    backend: str | None = None,
    agnostic: bool = False,
    merge: bool = False,
    classes: tuple[int, ...] | None = None,
):
    """[B, N, 6] candidates -> ([B, max_det, 6], [B, max_det] valid).

    ``agnostic``/``merge``/``classes`` mirror the reference's dormant
    Ultralytics ``non_max_suppression`` options (general.py:639-731):
    class-agnostic suppression, merge-NMS box fusion, and a keep-only-these
    class filter. All three stay fixed-shape (masking, not filtering).
    """
    if backend is None:
        backend = _default_backend()
    if backend not in _BACKENDS:
        raise ValueError(f"unknown NMS backend {backend!r}; "
                         f"choose from {_BACKENDS}")
    cand, cand_valid, offset_boxes = jax.vmap(
        lambda b: _select_candidates(b, conf_threshold, top_k, agnostic,
                                     classes)
    )(boxes)
    if backend in ("pallas", "pallas_interpret"):
        from podtpu.ops.pallas.nms_kernel import pallas_greedy_suppress

        keep = pallas_greedy_suppress(
            offset_boxes, cand_valid, iou_threshold,
            interpret=(backend == "pallas_interpret"),
        ) > 0.5
    elif backend == "xla_early":
        keep = _xla_suppress_early(offset_boxes, cand_valid, iou_threshold)
    else:
        keep = jax.vmap(
            lambda ob, cv: _xla_suppress(ob, cv, iou_threshold)
        )(offset_boxes, cand_valid)
    if merge:
        # the reference truncates the keep set to max_det BEFORE merging
        # (general.py:710-721): ranks past max_det neither merge nor backfill
        # slots freed by the redundant-drop. Candidates are score-sorted, so
        # the top-max_det survivors are the first max_det True keeps.
        keep = keep & (jnp.cumsum(keep, axis=1) <= max_detections)
        cand, keep = jax.vmap(
            lambda c, cv, ob, kp: _merge_kept(c, cv, ob, kp, iou_threshold)
        )(cand, cand_valid, offset_boxes, keep)
    return jax.vmap(lambda c, kp: _finalize(c, kp, max_detections))(cand, keep)


@functools.partial(jax.jit, static_argnames=_STATIC)
def nms_padded(
    boxes: jnp.ndarray,
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    top_k: int = 512,
    max_detections: int = 100,
    backend: str | None = None,
    agnostic: bool = False,
    merge: bool = False,
    classes: tuple[int, ...] | None = None,
):
    """Single-image NMS: [N, 6] -> ([max_det, 6], [max_det] valid)."""
    out, valid = batched_class_aware_nms(
        boxes[None], conf_threshold, iou_threshold, top_k, max_detections,
        backend, agnostic, merge, classes,
    )
    return out[0], valid[0]
