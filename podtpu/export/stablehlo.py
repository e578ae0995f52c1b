"""Model export via jax.export (StableHLO) — the deploy path.

The reference exports Lightning modules to ONNX opset 12 (torch2onnx.py:14-44)
and post-processes them for an NPU toolchain (onnx2novaonnx_converter.py).
The XLA-native equivalent is a serialized StableHLO artifact: portable,
versioned, runnable on any XLA backend (CPU/GPU/TPU) without Python model
code. ``inspect_exported`` plays the converter's op-whitelist role: it lists
the StableHLO ops in the artifact so a downstream toolchain can validate
support before deployment.

Artifacts are single files: serialized bytes. Reload with
:func:`load_exported` and call the result like a function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jexport


PLATFORMS = ("cpu", "tpu")  # default: artifacts portable across backends


def _input_spec(input_shape, dtype) -> jax.ShapeDtypeStruct:
    """Shape spec for export. A batch entry of ``None`` (or any string)
    becomes a SYMBOLIC dimension: the artifact then serves ANY batch size
    with one compiled program per size on load — XLA's native answer to
    ONNX dynamic axes (which the reference does not use: torch2onnx.py:35
    exports a fixed (1,3,416,416) sample)."""
    if input_shape[0] is None or isinstance(input_shape[0], str):
        dims = jexport.symbolic_shape(
            "b, " + ", ".join(str(int(d)) for d in input_shape[1:]))
        return jax.ShapeDtypeStruct(dims, dtype)
    return jax.ShapeDtypeStruct(tuple(int(d) for d in input_shape), dtype)


def export_forward(model, variables, input_shape, dtype=jnp.float32,
                   platforms=PLATFORMS):
    """Jit + export ``model.apply(variables, x, train=False)`` closed over
    weights (like ONNX export_params=True). Exported for ``platforms``
    (default cpu+tpu, so an artifact produced on a CPU dev box runs on TPU
    serving hosts); pass a single platform to freeze for one deployment
    target — multi-platform artifacts carry ``stablehlo.case`` dispatch
    that NPU validation rejects. ``input_shape[0] = None`` exports a
    symbolic (any-size) batch dimension."""

    def forward(x):
        return model.apply(variables, x, train=False)

    return jexport.export(jax.jit(forward), platforms=platforms)(
        _input_spec(input_shape, dtype))


def export_stablehlo(model, variables, input_shape, path: str,
                     dtype=jnp.float32, platforms=PLATFORMS) -> str:
    exported = export_forward(model, variables, input_shape, dtype, platforms)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return path


def export_serving(model, variables, cfg: dict, input_shape, path: str,
                   dtype=jnp.float32, platforms=PLATFORMS) -> str:
    """Export the full deployment unit: forward + decode + padded NMS.

    The reference's deployable graph is ``DecodeYoloVx`` — model + decode +
    nms in one module (utils/yolov3_utils.py:62-90). This is its artifact
    equivalent: one StableHLO program from image batch to
    ``(detections [B, max_det, 6], valid [B, max_det])``, weights frozen.
    cfg ``nms_options`` (multi_label/merge/agnostic/classes) and ``tta``
    (hflip test-time augmentation) bake into the artifact.
    """
    from podtpu.train.steps import make_serve_fn

    serve = make_serve_fn(
        cfg, lambda x: model.apply(variables, x, train=False))

    exported = jexport.export(jax.jit(serve), platforms=platforms)(
        _input_spec(input_shape, dtype))
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def load_exported(path: str):
    """Load a serialized artifact; returns a callable (jit-wrapped)."""
    with open(path, "rb") as f:
        data = f.read()
    exported = jexport.deserialize(data)
    return jax.jit(exported.call)


def inspect_exported(path: str) -> dict:
    """Summarize the artifact: op histogram + input/output signature.

    The nova-converter analog: downstream toolchains check this op set
    against their supported list (onnx2novaonnx_converter.py:27-65).
    """
    import collections
    import re

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    text = exported.mlir_module()
    # negative lookbehind: skip file-path mentions like ".../stablehlo.py"
    ops = collections.Counter(
        m.group(1) for m in re.finditer(r"(?<![/\w])(stablehlo\.\w+)", text)
        if m.group(1) != "stablehlo.py"
    )
    return {
        "in_avals": [str(a) for a in exported.in_avals],
        "out_avals": [str(a) for a in exported.out_avals],
        "ops": dict(sorted(ops.items(), key=lambda kv: -kv[1])),
        "platforms": list(exported.platforms),
    }
