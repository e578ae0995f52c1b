"""Post-training int8 quantization for the serving artifact.

The reference's deployment story targets an int8 NPU toolchain (the ONNX →
NOVA-ONNX converter feeds a conv NPU; onnx2novaonnx_converter.py). The
TPU-native equivalent is static PTQ on the exported serving graph: the v5e
MXU runs int8 x int8 -> int32 at twice the bf16 rate and int8 activations
halve the HBM bytes of a bandwidth-bound convnet.

Scheme (standard symmetric static PTQ):

* **weights**: per-output-channel symmetric int8
  (``w_scale[c] = absmax(kernel[..., c]) / 127``);
* **activations**: per-tensor symmetric int8, calibrated by running batches
  through the float model and recording the abs-max each ``ConvBnAct``
  input sees (sown into the ``quant_stats`` collection);
* the int32 accumulator dequantizes by ``x_scale * w_scale`` straight into
  the (f32) BN affine, so BN/ReLU stay full-precision;
* raw prediction heads (``HeadConv``) stay float — the usual
  first/last-layer accuracy exception.

Usage::

    stats = calibrate(model, variables, batches)
    qvars = build_quant_variables(variables, stats)
    export_stablehlo/export_serving(model, {**variables, **qvars}, ...)

No new export path is needed: ``ConvBnAct`` switches to the int8 conv
whenever the ``quant`` collection is present in ``apply`` variables.
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np


def calibrate(model, variables, batches: Iterable) -> dict:
    """Run calibration batches; return the merged ``quant_stats`` tree.

    ``batches`` yields input image batches (same layout as serving inputs).
    Per-batch abs-max trees are max-merged on the host. Abs-max (not a
    percentile) keeps the ReLU-bounded YOLO activations exact at the top of
    the range; if a future model family shows outlier-dominated scales,
    sow a per-block histogram instead.
    """
    run = jax.jit(
        lambda v, x: model.apply(v, x, train=False, mutable=["quant_stats"])[1]
    )
    merged = None
    for x in batches:
        stats = jax.device_get(run(variables, x)["quant_stats"])
        merged = stats if merged is None else jax.tree_util.tree_map(
            np.maximum, merged, stats
        )
    if merged is None:
        raise ValueError("calibrate() needs at least one batch")
    return {"quant_stats": merged}


def build_quant_variables(
    variables: dict,
    stats: dict,
    skip: Callable[[str], bool] | None = None,
) -> dict:
    """Build the ``quant`` collection from float params + calibration stats.

    Walks the param tree; every ``{conv: {kernel}, bn: ...}`` block (i.e.
    each ``ConvBnAct``) whose path has calibration data gets
    ``{w_int8 [kh,kw,ci,co], w_scale [co], x_scale []}``. ``skip(path)``
    (slash-joined module path) excludes blocks, e.g. to keep the stem float.
    """
    params = variables["params"]
    qstats = stats["quant_stats"]

    def walk(p: dict, s: dict, path: str) -> dict:
        out = {}
        is_convbn = (
            isinstance(p.get("conv"), dict)
            and "kernel" in p["conv"]
            and "bn" in p
            and "x_absmax" in s
        )
        if is_convbn and not (skip and skip(path)):
            kernel = np.asarray(p["conv"]["kernel"], np.float32)
            w_absmax = np.max(np.abs(kernel), axis=(0, 1, 2))
            w_scale = np.where(w_absmax > 0, w_absmax / 127.0, 1.0).astype(
                np.float32
            )
            w_int8 = np.clip(np.round(kernel / w_scale), -127, 127).astype(
                np.int8
            )
            x_absmax = float(np.asarray(s["x_absmax"]))
            x_scale = np.float32(x_absmax / 127.0 if x_absmax > 0 else 1.0)
            out = {"w_int8": jnp.asarray(w_int8),
                   "w_scale": jnp.asarray(w_scale),
                   "x_scale": jnp.asarray(x_scale)}
        for k, child in p.items():
            if isinstance(child, dict) and k not in ("conv", "bn"):
                sub = walk(child, s.get(k, {}), f"{path}/{k}" if path else k)
                if sub:
                    out[k] = sub
        return out

    quant = walk(params, qstats, "")
    if not quant:
        raise ValueError("no quantizable ConvBnAct blocks found")
    return {"quant": quant}


def quantize_for_serving(model, variables, batches, skip=None) -> dict:
    """One-call PTQ: calibrate + build; returns ``variables + quant``."""
    stats = calibrate(model, variables, batches)
    qvars = build_quant_variables(variables, stats, skip=skip)
    return {**variables, **qvars}
