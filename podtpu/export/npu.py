"""NPU-toolchain export conditioning (onnx2novaonnx_converter.py analog).

The reference converts ONNX to a vendor "NOVA ONNX" dialect for an NPU
compiler: onnxsim simplification with optional BN folding, node-name
sanitization, per-layer ``layer_idx`` attribute tagging, and validation
against a whitelist of supported ops *with hard failure*
(onnx2novaonnx_converter.py:27-65,150-263). The StableHLO-native equivalents:

* :func:`validate_for_npu` — parse the exported artifact's op set and FAIL
  (raise :class:`NPUValidationError`) when ops outside the accelerator's
  whitelist appear. The default whitelist models a conv-centric NPU: the
  while-loop/sort/gather machinery of the NMS tail is deliberately NOT on it,
  so a full serving graph fails validation and the forward graph passes —
  matching how such toolchains force post-processing off the NPU.
* :func:`annotate_for_npu` — a sanitized per-layer annotation map (the
  ``layer_idx``/``pool_at_pad`` tagging role): orders the artifact's
  convolution/pool ops and assigns stable sanitized names.
* :func:`fold_batchnorm` — fold BN statistics and affine params into the
  preceding conv kernels (the ``skip_fuse_bn=False`` onnxsim path), producing
  numerically identical eval outputs with identity BN parameters; XLA then
  constant-folds the identity BN away at compile time.
"""

from __future__ import annotations

import json
import re
from typing import Iterable

import numpy as np

# Conv-NPU supported-op model (the "38 ops" role). Structural/elementwise
# ops a systolic conv accelerator's compiler ingests; control flow, dynamic
# indexing, and host custom calls are excluded on purpose.
DEFAULT_NPU_WHITELIST = frozenset({
    "stablehlo.add", "stablehlo.subtract", "stablehlo.multiply",
    "stablehlo.divide", "stablehlo.maximum", "stablehlo.minimum",
    "stablehlo.convolution", "stablehlo.dot_general",
    "stablehlo.reduce_window", "stablehlo.reduce",
    "stablehlo.reshape", "stablehlo.transpose", "stablehlo.concatenate",
    "stablehlo.slice", "stablehlo.pad", "stablehlo.broadcast_in_dim",
    "stablehlo.constant", "stablehlo.convert", "stablehlo.return",
    "stablehlo.rsqrt", "stablehlo.sqrt", "stablehlo.exponential",
    "stablehlo.logistic", "stablehlo.tanh", "stablehlo.abs",
    "stablehlo.negate", "stablehlo.clamp", "stablehlo.floor",
    "stablehlo.select", "stablehlo.compare",
    # int8 PTQ artifacts (podtpu/export/quantize.py): quantize/dequantize
    "stablehlo.round_nearest_even",
})


class NPUValidationError(Exception):
    """Raised when an artifact uses ops outside the NPU whitelist."""

    def __init__(self, unsupported: dict):
        self.unsupported = unsupported
        ops = ", ".join(f"{k} x{v}" for k, v in sorted(unsupported.items()))
        super().__init__(f"unsupported ops for NPU target: {ops}")


def validate_for_npu(path: str, whitelist: Iterable[str] | None = None,
                     strict: bool = True) -> dict:
    """Check an exported artifact's op set against the NPU whitelist.

    Returns ``{"ok": bool, "unsupported": {op: count}, "ops": {op: count}}``;
    with ``strict`` (the default, matching the converter's assert-style
    failure) raises :class:`NPUValidationError` when unsupported ops appear.
    """
    from podtpu.export.stablehlo import inspect_exported

    wl = frozenset(whitelist) if whitelist is not None else DEFAULT_NPU_WHITELIST
    info = inspect_exported(path)
    unsupported = {op: n for op, n in info["ops"].items() if op not in wl}
    if unsupported and strict:
        raise NPUValidationError(unsupported)
    return {"ok": not unsupported, "unsupported": unsupported,
            "ops": info["ops"]}


def _sanitize(name: str) -> str:
    """Name sanitization (the converter rewrites node names to
    toolchain-safe identifiers — onnx2novaonnx_converter.py name pass)."""
    name = re.sub(r"[^0-9a-zA-Z_]", "_", name)
    return re.sub(r"_+", "_", name).strip("_").lower() or "op"


_TAGGED_OPS = {
    "stablehlo.convolution": "conv",
    "stablehlo.dot_general": "dense",
    "stablehlo.reduce_window": "pool",
}


def annotate_for_npu(path: str, out_json: str | None = None) -> dict:
    """Per-layer annotation map: ordered compute ops with sanitized names and
    ``layer_idx`` tags (the converter's attr-tagging role). Pool ops carry a
    ``pool_at_pad`` flag when their MLIR carries window padding.

    Expects a SINGLE-platform artifact (``export_model.py --platforms cpu``):
    multi-platform exports duplicate platform-divergent sites inside
    ``stablehlo.case`` branches, which would double-count layers here and
    fail :func:`validate_for_npu` anyway."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    text = exported.mlir_module()

    layers = []
    idx = 0
    for m in re.finditer(r"(?<![/\w])(stablehlo\.\w+)([^\n]*)", text):
        op, rest = m.group(1), m.group(2)
        kind = _TAGGED_OPS.get(op)
        if kind is None:
            continue
        entry = {"layer_idx": idx, "op": op,
                 "name": _sanitize(f"{kind}_{idx}")}
        if kind == "pool":
            entry["pool_at_pad"] = "padding" in rest
        layers.append(entry)
        idx += 1
    result = {"artifact": path, "num_layers": idx, "layers": layers}
    if out_json:
        with open(out_json, "w") as f:
            json.dump(result, f, indent=2)
    return result


def fold_batchnorm(variables: dict, eps: float = 1e-5) -> dict:
    """Fold BN into the preceding conv kernels; eval outputs are unchanged.

    For every ``{conv, bn}`` block (ConvBnAct): with ``g/b`` the BN affine,
    ``m/v`` the running stats, set

        kernel' = kernel * g/sqrt(v+eps) * sqrt(1+eps)
        bias'   = b - m * g/sqrt(v+eps),  scale'=1, mean'=0, var'=1

    so the identity-stat BN computes ``y = conv'(x)*rsqrt(1+eps) + bias'``
    == the original ``(conv(x)-m)*g/sqrt(v+eps) + b`` exactly (the
    ``sqrt(1+eps)`` factor cancels the identity BN's ``rsqrt(1+eps)``).
    Matches the onnxsim BN-fuse role (onnx2novaonnx_converter.py:33-41).
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    # plain nested dicts so we can mutate
    def to_dict(t):
        return ({k: to_dict(v) for k, v in t.items()}
                if isinstance(t, dict) or hasattr(t, "items") else t)

    params = to_dict(params)
    stats = to_dict(stats)

    def walk(p: dict, s: dict):
        if "conv" in p and "bn" in p and isinstance(p["conv"], dict) \
                and "kernel" in p["conv"] and "bn" in s:
            g, b = p["bn"]["scale"], p["bn"]["bias"]
            m, v = s["bn"]["mean"], s["bn"]["var"]
            inv = g / np.sqrt(v + eps)
            p["conv"]["kernel"] = (
                p["conv"]["kernel"] * (inv * np.sqrt(1.0 + eps))
            ).astype(p["conv"]["kernel"].dtype)
            p["bn"]["scale"] = np.ones_like(g)
            p["bn"]["bias"] = (b - m * inv).astype(b.dtype)
            s["bn"]["mean"] = np.zeros_like(m)
            s["bn"]["var"] = np.ones_like(v)
        for k, child in p.items():
            if isinstance(child, dict) and k not in ("conv", "bn"):
                walk(child, s.get(k, {}) if isinstance(s, dict) else {})

    walk(params, stats)
    return {"params": params, "batch_stats": stats}
