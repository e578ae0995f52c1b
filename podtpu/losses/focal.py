"""Focal loss (models/loss/focal_loss.py:5-27) — RetinaNet groundwork.

Standard alpha/gamma focal BCE on probabilities, computed in stable logits
form. Sum or mean reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from podtpu.losses.common import bce_logits


def focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    reduction: str = "sum",
) -> jnp.ndarray:
    p = jax.nn.sigmoid(logits)
    ce = bce_logits(logits, targets)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    loss = alpha_t * (1.0 - p_t) ** gamma * ce
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        return jnp.mean(loss)
    return loss
