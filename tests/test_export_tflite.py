"""TFLite / SavedModel export tests (podtpu/export/tflite.py).

The reference's deployment chain is ONNX + onnxruntime
(torch2onnx.py, onnx_inference.py) feeding an edge-NPU toolchain
(onnx2novaonnx_converter.py). These tests lock the TF interchange analog:
artifact outputs must match the live model, int8 PTQ must shrink the
artifact, and the SavedModel must serve through its signature.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # imports tensorflow (heavy)

pytest.importorskip("tensorflow")

from podtpu.export.tflite import (  # noqa: E402
    export_savedmodel,
    export_tflite,
    run_tflite,
)
from podtpu.models import build_model  # noqa: E402
from podtpu.train.state import create_train_state  # noqa: E402

CFG = {
    "model": "yolov4-tiny",
    "num_classes": 3,
    "input_size": 64,
    "in_channels": 3,
    "compute_dtype": "float32",
    "anchors": [[4, 5], [6, 8], [10, 9], [12, 16], [18, 14],
                [20, 24], [32, 28], [40, 44], [56, 52]],
    "conf_threshold": 0.05,
    "nms_iou_threshold": 0.45,
    "top_k_candidates": 64,
    "max_detections": 10,
    "optimizer": "sgd",
    "optimizer_options": {"lr": 1e-3},
}
SHAPE = (1, 64, 64, 3)


@pytest.fixture(scope="module")
def model_and_vars():
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    model = build_model(CFG)
    return model, {"params": state.params, "batch_stats": state.batch_stats}


@pytest.fixture(scope="module")
def x():
    return np.random.default_rng(0).uniform(0, 1, SHAPE).astype(np.float32)


def test_tflite_forward_parity(model_and_vars, x, tmp_path):
    model, variables = model_and_vars
    path = export_tflite(model, variables, SHAPE, str(tmp_path / "m.tflite"),
                         cfg=CFG)
    got = run_tflite(path, x)
    want = model.apply(variables, jnp.asarray(x), train=False)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(w), atol=1e-4)


def test_tflite_postprocess_matches_serve_fn(model_and_vars, x, tmp_path):
    """The deployed fwd+decode+NMS graph must reproduce the live one
    (DecodeYoloVx parity — utils/yolov3_utils.py:62-90)."""
    from podtpu.export.tflite import _serving_fn

    model, variables = model_and_vars
    path = export_tflite(model, variables, SHAPE,
                         str(tmp_path / "m_pp.tflite"), cfg=CFG,
                         with_postprocess=True)
    dets, valid = run_tflite(path, x)
    want_dets, want_valid = _serving_fn(model, variables, CFG, True)(
        jnp.asarray(x))
    np.testing.assert_array_equal(valid, np.asarray(want_valid))
    np.testing.assert_allclose(dets, np.asarray(want_dets), atol=1e-3)


def test_tflite_artifact_runner_and_eval(model_and_vars, x, tmp_path):
    """The shared artifact runner (test.py/inference.py --artifact) drives
    .tflite serving graphs: outputs identified by rank regardless of
    interpreter output order, forward-only artifacts rejected."""
    from podtpu.export.runner import artifact_runner

    model, variables = model_and_vars
    path = export_tflite(model, variables, SHAPE,
                         str(tmp_path / "srv.tflite"), cfg=CFG,
                         with_postprocess=True)
    run, batch = artifact_runner(path)
    assert batch == 1
    dets, valid = run(x)
    want_dets, want_valid = run_tflite(path, x)
    np.testing.assert_array_equal(valid, want_valid.astype(bool))
    np.testing.assert_allclose(dets, want_dets, atol=1e-6)

    fwd = export_tflite(model, variables, SHAPE,
                        str(tmp_path / "fwd.tflite"), cfg=CFG)
    with pytest.raises(ValueError, match="with-postprocess"):
        artifact_runner(fwd)


def test_tflite_int8_ptq_smaller_and_close(model_and_vars, x, tmp_path):
    import os

    model, variables = model_and_vars
    fpath = export_tflite(model, variables, SHAPE,
                          str(tmp_path / "f.tflite"), cfg=CFG)
    rep = [np.random.default_rng(i).uniform(0, 1, SHAPE).astype(np.float32)
           for i in range(4)]
    qpath = export_tflite(model, variables, SHAPE,
                          str(tmp_path / "q.tflite"), cfg=CFG,
                          quantize="int8", rep_batches=rep)
    assert os.path.getsize(qpath) < 0.5 * os.path.getsize(fpath)
    got = run_tflite(qpath, x)
    want = model.apply(variables, jnp.asarray(x), train=False)
    for g, w in zip(got, want):
        w = np.asarray(w)
        # int8 grid error on raw (pre-sigmoid) head outputs
        assert float(np.max(np.abs(g - w))) < 0.15


def test_tflite_dynamic_range(model_and_vars, x, tmp_path):
    model, variables = model_and_vars
    path = export_tflite(model, variables, SHAPE,
                         str(tmp_path / "d.tflite"), cfg=CFG,
                         quantize="dynamic")
    got = run_tflite(path, x)
    want = model.apply(variables, jnp.asarray(x), train=False)
    for g, w in zip(got, want):
        assert float(np.max(np.abs(g - np.asarray(w)))) < 0.15


def test_savedmodel_serving_signature(model_and_vars, x, tmp_path):
    import tensorflow as tf

    model, variables = model_and_vars
    path = export_savedmodel(model, variables, SHAPE, str(tmp_path / "sm"),
                             cfg=CFG)
    loaded = tf.saved_model.load(path)
    out = loaded.signatures["serving_default"](image=tf.constant(x))
    want = model.apply(variables, jnp.asarray(x), train=False)
    got = [out[k].numpy() for k in sorted(out.keys())]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(w), atol=1e-4)
