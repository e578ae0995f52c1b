"""Load-and-run helper for exported serving artifacts.

One place that knows how to execute a ``--with-postprocess`` export
(StableHLO via jax.export, or a .tflite flatbuffer on the TFLite CPU
interpreter) and normalize its outputs to ``(dets [B, M, 6], valid [B, M])``
— shared by ``test.py --artifact`` (full val-mAP through the deployed
graph) and ``inference.py --artifact`` (visual spot checks). The
reference's equivalent flow drives its ONNX export through onnxruntime
(onnx_inference.py:23-51) and re-enters the mAP tooling by hand.
"""

from __future__ import annotations

import numpy as np


def artifact_runner(artifact: str):
    """Return ``(run, batch_size)`` where ``run(x) -> (dets, valid)``.

    ``batch_size`` is ``None`` for symbolic-batch exports (``export_model.py
    --batch dyn``): the artifact then accepts any leading dimension and the
    caller picks. Rejects forward-only exports (no decode+NMS baked in)
    with a ``ValueError`` telling the user to re-export
    ``--with-postprocess``.
    """
    if artifact.endswith(".tflite"):
        from podtpu.export.tflite import load_interpreter

        interp, inp = load_interpreter(artifact)
        outs = interp.get_output_details()
        # tflite output order is not guaranteed: identify by rank
        dets_d = [d for d in outs if len(d["shape"]) == 3]
        valid_d = [d for d in outs if len(d["shape"]) == 2]
        if len(outs) != 2 or len(dets_d) != 1 or len(valid_d) != 1:
            raise ValueError(
                f"{artifact} is not a serving artifact (expected outputs "
                "dets [B,M,6] + valid [B,M]); re-export with "
                "--with-postprocess")

        def run(x):
            interp.set_tensor(inp["index"], np.asarray(x, np.float32))
            interp.invoke()
            return (interp.get_tensor(dets_d[0]["index"]),
                    interp.get_tensor(valid_d[0]["index"]).astype(bool))

        return run, int(inp["shape"][0])

    # deserialize ONCE and read avals directly — inspect_exported would
    # pretty-print the entire MLIR module (frozen weights inlined as dense
    # constants: hundreds of MB of text for a real checkpoint) just to
    # regex an op histogram this path never uses
    import jax
    from jax import export as jexport

    with open(artifact, "rb") as f:
        exported = jexport.deserialize(f.read())
    if len(exported.out_avals) != 2:
        raise ValueError(
            f"{artifact} is not a serving artifact (outputs: "
            f"{[str(a) for a in exported.out_avals]}); re-export with "
            "--with-postprocess")
    fn = jax.jit(exported.call)

    def run(x):
        dets, valid = fn(x)
        return np.asarray(dets), np.asarray(valid).astype(bool)

    lead = exported.in_avals[0].shape[0]
    # symbolic batch dims are _DimExpr objects (int(d) raises); concrete
    # dims are plain ints
    return run, (int(lead) if isinstance(lead, int) else None)


def prepare_input(x: np.ndarray) -> np.ndarray:
    """The artifact input contract: float32 in [0, 1] (exports trace a
    float input spec; loaders may ship uint8 batches). One definition for
    every artifact consumer."""
    x = np.asarray(x)
    if x.dtype == np.uint8:
        return x.astype(np.float32) / 255.0
    return x
