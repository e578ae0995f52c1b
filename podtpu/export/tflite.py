"""TFLite / TF SavedModel export — the edge-deployment interchange formats.

The reference's deployment chain is torch → ONNX (torch2onnx.py:14-44) →
an edge-NPU toolchain front-end (onnx2novaonnx_converter.py). podtpu's
XLA-native artifact is serialized StableHLO (podtpu/export/stablehlo.py);
this module adds the TF interchange formats edge toolchains ingest
directly, via jax2tf (weights frozen into the graph, like ONNX
``export_params=True``):

* **SavedModel** — the TF-Serving / TF-Hub deployment unit.
* **.tflite flatbuffer** — the LiteRT / edge-NPU delegate format, with
  optional post-training quantization: ``dynamic`` (int8 weights,
  float compute) or ``int8`` (full integer PTQ calibrated on a
  representative dataset — the int8-NPU role the reference's nova
  converter prepares for).

Both accept the forward graph or the full serving unit (forward + decode +
padded NMS — the reference's ``DecodeYoloVx`` deployment graph,
utils/yolov3_utils.py:62-90).
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import numpy as np


def _serving_fn(model, variables, cfg: dict | None,
                with_postprocess: bool) -> Callable:
    """The jax callable to export: forward, or forward+decode+NMS."""
    if not with_postprocess:
        return lambda x: model.apply(variables, x, train=False)

    from podtpu.train.steps import make_postprocess

    postprocess = make_postprocess(cfg)

    def serve(x):
        preds = model.apply(variables, x, train=False)
        return postprocess(preds)

    return serve


def _concrete_function(fn: Callable, input_shape):
    from jax.experimental import jax2tf
    import tensorflow as tf

    tf_fn = tf.function(
        jax2tf.convert(jax.jit(fn)),
        input_signature=[tf.TensorSpec(input_shape, tf.float32, name="image")],
        autograph=False,
    )
    return tf_fn, tf_fn.get_concrete_function()


def export_savedmodel(model, variables, input_shape, path: str,
                      cfg: dict | None = None,
                      with_postprocess: bool = False) -> str:
    """Write a TF SavedModel directory with a ``serving_default`` signature."""
    import tensorflow as tf

    fn = _serving_fn(model, variables, cfg, with_postprocess)
    tf_fn, concrete = _concrete_function(fn, input_shape)
    module = tf.Module()
    module.serve = tf_fn
    tf.saved_model.save(
        module, path, signatures={"serving_default": concrete})
    return path


def export_tflite(model, variables, input_shape, path: str,
                  cfg: dict | None = None,
                  with_postprocess: bool = False,
                  quantize: str | None = None,
                  rep_batches: Iterable[np.ndarray] | None = None) -> str:
    """Write a .tflite flatbuffer.

    ``quantize``: ``None`` = float32; ``"dynamic"`` = dynamic-range int8
    weights; ``"int8"`` = full integer PTQ — requires ``rep_batches``
    (an iterable of float32 input arrays of ``input_shape``) to calibrate
    activation ranges. Ops the quantizer cannot lower to int8 (e.g. the
    NMS sort/while control flow in --with-postprocess graphs) keep float
    fallback kernels, matching the int8-conv/float-head split of the
    StableHLO int8 path (podtpu/export/quantize.py).
    """
    import tensorflow as tf

    fn = _serving_fn(model, variables, cfg, with_postprocess)
    tf_fn, concrete = _concrete_function(fn, input_shape)
    converter = tf.lite.TFLiteConverter.from_concrete_functions(
        [concrete], trackable_obj=tf_fn)
    if quantize == "dynamic":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
    elif quantize == "int8":
        if rep_batches is None:
            raise ValueError("int8 PTQ needs rep_batches for calibration")
        batches = [np.asarray(b, np.float32) for b in rep_batches]
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.representative_dataset = lambda: ([b] for b in batches)
    elif quantize is not None:
        raise ValueError(f"unknown quantize mode '{quantize}' "
                         "(expected dynamic | int8)")
    data = converter.convert()
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_interpreter(path: str):
    """TFLite CPU interpreter with tensors allocated.

    Returns ``(interpreter, input_detail)`` — the shared setup for
    :func:`run_tflite` (parity tests) and exported_inference.py's
    ``bench_tflite`` (FPS benchmarking), so the interpreter-driving code
    lives in exactly one place.
    """
    import tensorflow as tf

    interp = tf.lite.Interpreter(model_path=path)
    interp.allocate_tensors()
    (inp,) = interp.get_input_details()
    return interp, inp


def run_tflite(path: str, x: np.ndarray):
    """Execute a .tflite artifact on the TFLite CPU interpreter.

    Returns a single array or a tuple matching the exported outputs —
    used by tests for artifact/eval-step parity.
    """
    interp, inp = load_interpreter(path)
    interp.set_tensor(inp["index"], np.asarray(x, np.float32))
    interp.invoke()
    outs = [interp.get_tensor(d["index"]) for d in interp.get_output_details()]
    return outs[0] if len(outs) == 1 else tuple(outs)
