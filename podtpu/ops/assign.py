"""Device-resident YOLO target assignment (ground truth -> grid targets).

The reference encodes targets with nested Python loops over
``[batch, max_annots]`` on CPU inside every training step, then copies the
result to the accelerator (models/loss/yolov2_loss.py:260-315,
yolov3_loss.py:292-362, yolov1_loss.py:114-146) — the single biggest
throughput sin in its hot loop. Here the per-GT math (grid cell, anchor
match, layer gate) is fully vectorized, and the grid writes run in one
``lax.scan`` over the *fixed* annotation axis so XLA compiles a single
program and the reference's write-order semantics are preserved bit-for-bit:

* v2/v3: a later GT falling in the same (cell, anchor) overwrites an earlier
  one (the loop's last write wins);
* v1: the first GT in a cell wins (yolov1_loss.py:141 guards on an empty
  cell);
* v3: a GT contributes to a layer only when its globally-best anchor (over
  all 9, matched in input pixels) belongs to that layer's triplet
  (yolov3_loss.py:337-343).

An order-free scatter formulation (scatter-max of the annotation index
per slot + gather) was tried and measured SLOWER on TPU v5e — 243.9 vs
137.3 ms for the full YOLOv3-416 batch-128 train step — because XLA:TPU
lowers duplicate-index scatters poorly; the T-step scan of small dense
updates wins and stays.

The DEFAULT is a second, scatter-free *dense* formulation
(``backend="dense"`` / env ``PODTPU_ENCODER``): the last-write-wins slot
owner is a max-reduction of the annotation order over a broadcast slot-id
comparison, per-slot values are a gather from the winning annotation, and
the noobj ignore mask is a one-hot matmul (``cell-onehot @ iou-mask``) that
runs on the MXU. It produces bit-identical targets (locked by
tests/test_assign.py running every oracle under both backends) with no
sequential dependency at all — the whole encoder is parallel
compare/reduce/matmul work instead of a 64-iteration while loop. Measured
on the v5e batch-128 YOLOv3-416 train step: 973.7/971.2 img/s dense vs
938.2 scan (+3.8%; the three whiles disappear from the critical path).
``PODTPU_ENCODER=scan`` restores the sequential writer.

Grid layout is [B, H, W, A] (NHWC-consistent with the heads), vs. the
reference's [B, A, H, W] — a pure transpose, irrelevant to semantics.

Annotations are [B, T, 5] rows ``[cx, cy, w, h, cid]`` normalized to [0, 1],
padded with -1 rows; a row is valid iff its sum > 0 (utils/yolo_utils.py:31,
yolov2_loss.py:289).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from podtpu.ops.boxes import wh_iou


def _default_backend() -> str:
    return os.environ.get("PODTPU_ENCODER", "dense")


class AnchorTargets(NamedTuple):
    """Targets for one anchor-grid layer; all [B, H, W, A] unless noted."""

    mask: jnp.ndarray        # 1 where a GT is assigned
    noobj_mask: jnp.ndarray  # 1 where the no-object loss applies
    tbox: jnp.ndarray        # [B, H, W, A, 4]: (x_off, y_off, w/anchor_w, h/anchor_h)
    tconf: jnp.ndarray       # objectness target (== mask for v2/v3 losses)
    tcls: jnp.ndarray        # [B, H, W, A, C] one-hot / label-smoothed


def _valid_rows(target: jnp.ndarray) -> jnp.ndarray:
    """[B, T] validity: padding rows are -1-filled so their sum is <= 0."""
    return jnp.sum(target, axis=-1) > 0.0


def encode_anchor_targets(
    target: jnp.ndarray,
    num_classes: int,
    scaled_anchors,
    layer_w: int,
    layer_h: int,
    ignore_threshold: float = 0.5,
    match_anchors=None,
    layer_anchor_slice: tuple[int, int] | None = None,
    match_scale: tuple[float, float] | None = None,
    cls_pos: float = 1.0,
    cls_neg: float = 0.0,
    cls_accumulate: bool = False,
    backend: str | None = None,
) -> AnchorTargets:
    """Encode GT boxes onto one anchor grid.

    Args:
      target: [B, T, 5] padded annotations (normalized cxcywh + cid).
      num_classes: C.
      scaled_anchors: [A, 2] anchors in this layer's grid units — used for
        the tbox w/h ratios.
      layer_w, layer_h: grid size.
      ignore_threshold: anchors whose wh-IoU with the GT exceeds this get
        noobj_mask = 0 at the GT's cell.
      match_anchors: [M, 2] anchors used for the best-anchor argmax. Defaults
        to ``scaled_anchors`` (YOLOv2). For YOLOv3 pass all 9 global anchors
        in input pixels.
      layer_anchor_slice: (start, end) into ``match_anchors`` owned by this
        layer; a GT whose global argmax falls outside is skipped (YOLOv3
        layer gating). The ignore-IoU row is the sliced local triplet.
      match_scale: (sx, sy) multiplying normalized GT w/h for the match IoU —
        (layer_w, layer_h) for v2 grid-unit matching, (input, input) for v3
        pixel matching. Defaults to (layer_w, layer_h).
      cls_pos, cls_neg: class target values (label smoothing for YoloV3LossV2
        uses smooth_BCE(0.01): yolov3_loss.py:227,359-360).
      cls_accumulate: the reference's UNSMOOTHED encoders write only
        ``tcls[..., cid] = 1`` with no row reset (yolov2_loss.py:165,309,
        yolov3_loss.py:190 — the reset lines are commented out), so two GTs
        colliding on one (cell, anchor) slot leave BOTH class bits set.
        True reproduces that (requires cls_pos=1/cls_neg=0); False is the
        smoothed writers' full-row overwrite (yolov3_loss.py:359-360).
      backend: "scan" (sequential writes) or "dense" (winner-index
        max-reduce + one-hot matmuls). ``None`` reads ``PODTPU_ENCODER``
        (default "scan"). Both are bit-identical.

    Returns:
      :class:`AnchorTargets` with float32 arrays.
    """
    target = target.astype(jnp.float32)
    b, t, _ = target.shape
    scaled_anchors = jnp.asarray(scaled_anchors, dtype=jnp.float32)
    num_anchors = scaled_anchors.shape[0]
    if match_anchors is None:
        match_anchors = scaled_anchors
    match_anchors = jnp.asarray(match_anchors, dtype=jnp.float32)
    if match_scale is None:
        match_scale = (float(layer_w), float(layer_h))

    valid = _valid_rows(target)  # [B, T]

    # --- vectorized per-GT quantities -------------------------------------
    gx = target[..., 0] * layer_w
    gy = target[..., 1] * layer_h
    gw = target[..., 2] * layer_w
    gh = target[..., 3] * layer_h
    gi = jnp.clip(gx.astype(jnp.int32), 0, layer_w - 1)  # [B, T]
    gj = jnp.clip(gy.astype(jnp.int32), 0, layer_h - 1)
    cid = jnp.clip(target[..., 4].astype(jnp.int32), 0, num_classes - 1)

    match_wh = jnp.stack(
        [target[..., 2] * match_scale[0], target[..., 3] * match_scale[1]], axis=-1
    )  # [B, T, 2]
    iou = wh_iou(match_wh.reshape(b * t, 2), match_anchors).reshape(b, t, -1)
    best_global = jnp.argmax(iou, axis=-1)  # [B, T]

    if layer_anchor_slice is not None:
        lo, hi = layer_anchor_slice
        in_layer = (best_global >= lo) & (best_global < hi)
        valid = valid & in_layer
        best = best_global - lo
        iou_local = iou[..., lo:hi]  # [B, T, A]
    else:
        best = best_global
        iou_local = iou
    best = jnp.clip(best, 0, num_anchors - 1)

    tbox_gt = jnp.stack(
        [
            gx - gi.astype(jnp.float32),
            gy - gj.astype(jnp.float32),
            gw / scaled_anchors[best, 0],
            gh / scaled_anchors[best, 1],
        ],
        axis=-1,
    )  # [B, T, 4]
    tcls_gt = jnp.full((b, t, num_classes), cls_neg, dtype=jnp.float32)
    tcls_gt = jnp.where(
        jax.nn.one_hot(cid, num_classes, dtype=bool), cls_pos, tcls_gt
    )

    if cls_accumulate and not (cls_pos == 1.0 and cls_neg == 0.0):
        raise ValueError("cls_accumulate models the reference's unsmoothed "
                         "bit-set writes; it requires cls_pos=1, cls_neg=0")

    if (backend or _default_backend()) == "dense":
        return _dense_anchor_writes(
            valid, gj, gi, best, iou_local, tbox_gt, tcls_gt,
            layer_h, layer_w, num_anchors, num_classes, ignore_threshold,
            cls_accumulate,
        )

    # --- sequential grid writes (preserves the reference's overwrite order) -
    init = AnchorTargets(
        mask=jnp.zeros((b, layer_h, layer_w, num_anchors), jnp.float32),
        noobj_mask=jnp.ones((b, layer_h, layer_w, num_anchors), jnp.float32),
        tbox=jnp.zeros((b, layer_h, layer_w, num_anchors, 4), jnp.float32),
        tconf=jnp.zeros((b, layer_h, layer_w, num_anchors), jnp.float32),
        tcls=jnp.zeros((b, layer_h, layer_w, num_anchors, num_classes), jnp.float32),
    )
    bidx = jnp.arange(b)

    def step(state: AnchorTargets, xs):
        v, gj_t, gi_t, best_t, iou_t, tbox_t, tcls_t = xs
        # noobj: zero all anchors at the GT cell whose wh-IoU > threshold.
        cell_no = state.noobj_mask[bidx, gj_t, gi_t]  # [B, A]
        cell_no = jnp.where(v[:, None] & (iou_t > ignore_threshold), 0.0, cell_no)
        noobj = state.noobj_mask.at[bidx, gj_t, gi_t].set(cell_no)

        def put(arr, val):
            old = arr[bidx, gj_t, gi_t, best_t]
            new = jnp.where(_bcast(v, val), val, old)
            return arr.at[bidx, gj_t, gi_t, best_t].set(new)

        if cls_accumulate:
            # unsmoothed reference write: set the class bit, keep the rest
            # of the row (same-slot collisions accumulate both classes)
            old_row = state.tcls[bidx, gj_t, gi_t, best_t]
            new_row = jnp.where(_bcast(v, tcls_t),
                                jnp.maximum(old_row, tcls_t), old_row)
            tcls = state.tcls.at[bidx, gj_t, gi_t, best_t].set(new_row)
        else:
            tcls = put(state.tcls, tcls_t)

        return (
            AnchorTargets(
                mask=put(state.mask, jnp.ones((b,), jnp.float32)),
                noobj_mask=noobj,
                tbox=put(state.tbox, tbox_t),
                tconf=put(state.tconf, jnp.ones((b,), jnp.float32)),
                tcls=tcls,
            ),
            None,
        )

    xs = (
        valid.T,                      # [T, B]
        gj.T, gi.T, best.T,           # [T, B]
        jnp.moveaxis(iou_local, 1, 0),  # [T, B, A]
        jnp.moveaxis(tbox_gt, 1, 0),    # [T, B, 4]
        jnp.moveaxis(tcls_gt, 1, 0),    # [T, B, C]
    )
    out, _ = jax.lax.scan(step, init, xs)
    return out


def _bcast(v: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Broadcast the [B] validity flag against a [B, ...] value."""
    return v.reshape(v.shape + (1,) * (like.ndim - 1))


def _dense_anchor_writes(
    valid, gj, gi, best, iou_local, tbox_gt, tcls_gt,
    layer_h: int, layer_w: int, num_anchors: int, num_classes: int,
    ignore_threshold: float, cls_accumulate: bool = False,
) -> AnchorTargets:
    """Order-free re-expression of the scan's grid writes.

    Last-write-wins becomes "the annotation with the highest order number
    owns the slot": ``winner[b, s] = max_t (t+1) * [slot_t == s]`` — one
    broadcast compare + max-reduce, no sequential dependency. Per-slot
    values are a gather from the winning annotation; the noobj ignore mask
    is monotone (only ever zeroed), so it is an OR over annotations —
    computed as a ``[B,T,HW] @ [B,T,A]`` one-hot matmul on the MXU.
    """
    b, t = valid.shape
    hw = layer_h * layer_w
    n_slots = hw * num_anchors

    cell = gj * layer_w + gi                               # [B, T]
    slot = cell * num_anchors + best                       # [B, T]
    order = jnp.where(valid, jnp.arange(1, t + 1, dtype=jnp.int32)[None, :], 0)

    # Slot owner: max annotation order among annotations writing this slot.
    eq = slot[:, :, None] == jnp.arange(n_slots, dtype=jnp.int32)  # [B, T, S]
    winner = jnp.max(jnp.where(eq, order[:, :, None], 0), axis=1)  # [B, S]
    mask_flat = (winner > 0).astype(jnp.float32)

    # Values of the winning annotation: select along the (small) T axis as
    # a one-hot matmul. A take_along_axis gather here lowers to a dynamic-
    # slice loop that xprof measured at 18 GB/s (7.4 ms/step across the
    # three grids, RESULTS.md round-11 roofline closure); the one-hot
    # einsum rides the MXU and is bit-exact — each output element has
    # exactly one nonzero product.
    idx = jnp.clip(winner - 1, 0, t - 1)                   # [B, S]
    feats = jnp.concatenate([tbox_gt, tcls_gt], axis=-1)   # [B, T, 4+C]
    sel = (idx[:, :, None] == jnp.arange(t, dtype=jnp.int32)
           ).astype(feats.dtype)                           # [B, S, T]
    vals = jnp.einsum("bst,btc->bsc", sel, feats)          # [B, S, 4+C]
    vals = vals * mask_flat[:, :, None]

    # noobj: zero every (cell, anchor) where ANY valid GT in that cell has
    # wh-IoU > threshold with that anchor — an OR over T == one-hot matmul.
    cellhot = (
        (cell[:, :, None] == jnp.arange(hw, dtype=jnp.int32)) & valid[:, :, None]
    ).astype(jnp.float32)                                  # [B, T, HW]
    ioum = (iou_local > ignore_threshold).astype(jnp.float32)  # [B, T, A]
    hit = jnp.einsum("bth,bta->bha", cellhot, ioum)        # [B, HW, A]
    noobj = (hit == 0.0).astype(jnp.float32)

    tcls_flat = vals[..., 4:]
    if cls_accumulate:
        # unsmoothed reference writes accumulate class bits across every
        # valid GT hitting the slot: OR over T == one-hot matmul, clipped
        wrote = (eq & (order[:, :, None] > 0)).astype(jnp.float32)  # [B,T,S]
        tcls_flat = jnp.minimum(
            jnp.einsum("bts,btc->bsc", wrote, tcls_gt), 1.0)

    grid = (b, layer_h, layer_w, num_anchors)
    return AnchorTargets(
        mask=mask_flat.reshape(grid),
        noobj_mask=noobj.reshape(grid),
        tbox=vals[..., :4].reshape(grid + (4,)),
        tconf=mask_flat.reshape(grid),
        tcls=tcls_flat.reshape(grid + (num_classes,)),
    )


class Yolov1Targets(NamedTuple):
    mask: jnp.ndarray  # [B, S, S] cell has an object
    tbox: jnp.ndarray  # [B, S, S, 4]: (x_off, y_off, w_norm, h_norm)
    tcls: jnp.ndarray  # [B, S, S, C] one-hot


def encode_yolov1_targets(
    target: jnp.ndarray, num_classes: int, grid_size: int = 7,
    backend: str | None = None,
) -> Yolov1Targets:
    """YOLOv1 grid encoding: first GT per cell wins (yolov1_loss.py:130-144).

    w/h targets stay normalized to the image (the reference stores
    ``target[b, t, 2:4]`` raw: yolov1_loss.py:143). ``backend`` as in
    :func:`encode_anchor_targets`; the dense form is a MIN-reduce of the
    annotation order (first write wins, not last).
    """
    target = target.astype(jnp.float32)
    b, t, _ = target.shape
    s = grid_size
    valid = _valid_rows(target)

    gx = target[..., 0] * s
    gy = target[..., 1] * s
    gi = jnp.clip(gx.astype(jnp.int32), 0, s - 1)
    gj = jnp.clip(gy.astype(jnp.int32), 0, s - 1)
    cid = jnp.clip(target[..., 4].astype(jnp.int32), 0, num_classes - 1)
    tbox_gt = jnp.stack(
        [gx - gi.astype(jnp.float32), gy - gj.astype(jnp.float32),
         target[..., 2], target[..., 3]],
        axis=-1,
    )
    tcls_gt = jax.nn.one_hot(cid, num_classes, dtype=jnp.float32)

    if (backend or _default_backend()) == "dense":
        n_slots = s * s
        cell = gj * s + gi                                     # [B, T]
        order = jnp.where(
            valid, jnp.arange(1, t + 1, dtype=jnp.int32)[None, :], t + 1)
        eq = cell[:, :, None] == jnp.arange(n_slots, dtype=jnp.int32)
        winner = jnp.min(jnp.where(eq, order[:, :, None], t + 1), axis=1)
        mask_flat = (winner <= t).astype(jnp.float32)          # [B, S*S]
        idx = jnp.clip(winner - 1, 0, t - 1)
        feats = jnp.concatenate([tbox_gt, tcls_gt], axis=-1)   # [B, T, 4+C]
        # one-hot select instead of gather (see encode_anchor_targets)
        sel = (idx[:, :, None] == jnp.arange(t, dtype=jnp.int32)
               ).astype(feats.dtype)                           # [B, S, T]
        vals = jnp.einsum("bst,btc->bsc", sel, feats)
        vals = vals * mask_flat[:, :, None]
        return Yolov1Targets(
            mask=mask_flat.reshape(b, s, s),
            tbox=vals[..., :4].reshape(b, s, s, 4),
            tcls=vals[..., 4:].reshape(b, s, s, num_classes),
        )

    init = Yolov1Targets(
        mask=jnp.zeros((b, s, s), jnp.float32),
        tbox=jnp.zeros((b, s, s, 4), jnp.float32),
        tcls=jnp.zeros((b, s, s, num_classes), jnp.float32),
    )
    bidx = jnp.arange(b)

    def step(state: Yolov1Targets, xs):
        v, gj_t, gi_t, tbox_t, tcls_t = xs
        vacant = state.mask[bidx, gj_t, gi_t] == 0.0
        write = v & vacant

        def put(arr, val):
            old = arr[bidx, gj_t, gi_t]
            new = jnp.where(_bcast(write, val), val, old)
            return arr.at[bidx, gj_t, gi_t].set(new)

        return (
            Yolov1Targets(
                mask=put(state.mask, jnp.ones((b,), jnp.float32)),
                tbox=put(state.tbox, tbox_t),
                tcls=put(state.tcls, tcls_t),
            ),
            None,
        )

    xs = (valid.T, gj.T, gi.T, jnp.moveaxis(tbox_gt, 1, 0), jnp.moveaxis(tcls_gt, 1, 0))
    out, _ = jax.lax.scan(step, init, xs)
    return out
