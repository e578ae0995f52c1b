"""Shared loss math: masked sums, BCE-on-logits, NaN-safe masked CIoU."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from podtpu.ops.boxes import bbox_iou


def smooth_bce(eps: float = 0.1) -> tuple[float, float]:
    """Label-smoothing (positive, negative) targets (yolov3_loss.py:12-14)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross-entropy on raw logits.

    Numerically equal to the reference's ``BCELoss(sigmoid(x), z)`` but
    computed in the stable logits form (no log(0)).
    """
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """sum(x * mask) with mask broadcast over trailing dims of x."""
    mask = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
    return jnp.sum(x * mask)


def masked_ciou_loss(pbox: jnp.ndarray, tbox: jnp.ndarray, mask: jnp.ndarray
                     ) -> jnp.ndarray:
    """sum over masked positions of (1 - CIoU(pbox, tbox)).

    Both boxes are [..., 4] cxcywh; mask is [...]. Unmasked positions are
    replaced by a dummy unit box *before* the CIoU so that the 0/0 terms
    (atan of 0-width targets) can't poison the value or the gradient
    (the standard double-where trick).
    """
    dummy = jnp.array([0.5, 0.5, 1.0, 1.0], dtype=pbox.dtype)
    m = mask[..., None].astype(bool)
    pbox_safe = jnp.where(m, pbox, dummy)
    tbox_safe = jnp.where(m, tbox, dummy)
    ciou = bbox_iou(pbox_safe, tbox_safe, CIoU=True)[..., 0]
    return jnp.sum(jnp.where(mask.astype(bool), 1.0 - ciou, 0.0))


def sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid(x)
