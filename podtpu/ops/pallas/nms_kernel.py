"""Pallas TPU kernel: greedy NMS suppression (batched).

The suppression stage of NMS is the one inherently sequential piece of the
eval path: after sorting by score, box i survives iff no surviving j < i of
the same class overlaps it above the threshold. In plain XLA this is a
``fori_loop`` whose [K, K] IoU matrix round-trips through HBM and whose K
iterations each dispatch as separate while-body executions.

This kernel computes the IoU matrix AND runs the whole suppression loop in
one ``pallas_call`` per image (grid over the batch): boxes land in VMEM once,
the [K, K] matrix never leaves VMEM (K=512 -> 1 MB f32, well under the
~16 MB budget), and each loop step is a single K-wide VPU op.

Class-awareness comes in via the caller's per-class coordinate offset (same
trick as the XLA path). Masks are float32 (vector-register friendly); shapes
are fully static. TPU block-mapping rules require the last two block dims to
divide (8, 128) or equal the array dims, hence the [B, 1, K] layout for the
1-D per-box vectors.

Falls back to interpreter mode off-TPU so tests run hermetically on CPU.

Measured on TPU v5e (batch 8 x 10647 candidates, K=512): this kernel runs at
3.7 ms/batch vs 0.04 ms/batch for the plain-XLA fori_loop path with identical
outputs — XLA's while-loop codegen wins on this tiny sequential vector
workload, so the XLA path stays the default (see
``podtpu.ops.nms._default_backend``; PODTPU_NMS_BACKEND=pallas selects this
kernel). Kept as the validated scaffold for a future fused decode+NMS kernel
where VMEM residency across stages actually pays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _suppress_kernel(boxes_ref, valid_ref, out_ref, *, iou_threshold: float):
    boxes = boxes_ref[0]      # [K, 4] xyxy (+ class offset)
    valid = valid_ref[0, 0]   # [K] float32 1/0
    k = boxes.shape[0]

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]

    iw = jnp.clip(
        jnp.minimum(x2[:, None], x2[None, :]) - jnp.maximum(x1[:, None], x1[None, :]),
        0.0,
    )
    ih = jnp.clip(
        jnp.minimum(y2[:, None], y2[None, :]) - jnp.maximum(y1[:, None], y1[None, :]),
        0.0,
    )
    inter = iw * ih
    area = (x2 - x1) * (y2 - y1)
    iou = inter / (area[:, None] + area[None, :] - inter + 1e-6)

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    # suppress[i, j] = 1 where i would kill j; the alive-gating in the loop
    # makes the full off-diagonal form equivalent to strictly-upper form.
    suppress = jnp.where(
        (iou > iou_threshold) & (row_ids != col_ids), 1.0, 0.0
    ).astype(jnp.float32)

    # Mosaic can't dynamic-slice VALUES, only refs — park the matrix in a
    # VMEM scratch and read rows with pl.ds; the alive bit comes from an
    # iota one-hot reduction (no dynamic scalar indexing).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def scoped(suppress_ref):
        suppress_ref[:] = suppress

        def body(i, keep):
            row = suppress_ref[pl.ds(i, 1), :]          # [1, K]
            alive = jnp.sum(jnp.where(lane == i, keep, 0.0))
            return keep * (1.0 - alive * row)

        keep = jax.lax.fori_loop(0, k, body, valid.reshape(1, k))
        out_ref[0] = keep

    pl.run_scoped(scoped, pltpu.VMEM((k, k), jnp.float32))


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_greedy_suppress(
    boxes_xyxy: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float = 0.45,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched greedy suppression.

    Args:
      boxes_xyxy: [B, K, 4] score-sorted, class-offset corner boxes.
      valid: [B, K] 1/0 candidate validity.

    Returns [B, K] float32 keep mask. ``interpret=True`` runs the Pallas
    interpreter (CPU tests).
    """
    b, k, _ = boxes_xyxy.shape
    kernel = functools.partial(_suppress_kernel, iou_threshold=iou_threshold)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.float32),
        interpret=interpret,
    )(boxes_xyxy.astype(jnp.float32), valid.astype(jnp.float32)[:, None, :])
    return out[:, 0, :]
