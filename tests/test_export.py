"""Export-path tests: StableHLO round trip, weights npz round trip/partial."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from podtpu.export.stablehlo import export_stablehlo, inspect_exported, load_exported
from podtpu.export.weights import load_npz_weights, save_npz_weights
from podtpu.models import YoloV4Tiny
from podtpu.train.state import create_train_state

pytestmark = pytest.mark.slow

CFG = {
    "model": "yolov4-tiny",
    "num_classes": 3,
    "input_size": 64,
    "in_channels": 3,
    "compute_dtype": "float32",
    "anchors": [[4, 5], [6, 8], [10, 9], [12, 16], [18, 14],
                [20, 24], [32, 28], [40, 44], [56, 52]],
    "optimizer": "sgd",
    "optimizer_options": {"lr": 1e-3},
}


@pytest.fixture(scope="module")
def model_and_vars():
    model = YoloV4Tiny(num_classes=3)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


def test_stablehlo_roundtrip(model_and_vars, tmp_path):
    model, variables, x = model_and_vars
    path = str(tmp_path / "model.stablehlo")
    export_stablehlo(model, variables, (1, 64, 64, 3), path)

    fn = load_exported(path)
    x_np = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    got = fn(jnp.asarray(x_np))
    want = model.apply(variables, jnp.asarray(x_np), train=False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5)


def test_inspect_exported(model_and_vars, tmp_path):
    model, variables, _ = model_and_vars
    path = str(tmp_path / "model.stablehlo")
    export_stablehlo(model, variables, (1, 64, 64, 3), path)
    info = inspect_exported(path)
    assert "stablehlo.convolution" in info["ops"]
    assert info["in_avals"][0].startswith("float32[1,64,64,3]")


def test_serving_export_matches_eval_step(model_and_vars, tmp_path):
    """The serving artifact (fwd+decode+NMS) must produce the same detections
    as make_eval_step on the same batch — VERDICT r1 item 4."""
    from podtpu.export.stablehlo import export_serving
    from podtpu.ops.nms import batched_class_aware_nms
    from podtpu.train.steps import make_decoder

    model, variables, _ = model_and_vars
    path = str(tmp_path / "serve.stablehlo")
    export_serving(model, variables, CFG, (2, 64, 64, 3), path)
    fn = load_exported(path)

    x = np.random.default_rng(3).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    got_dets, got_valid = fn(jnp.asarray(x))

    preds = model.apply(variables, jnp.asarray(x), train=False)
    boxes = make_decoder(CFG)(preds)
    want_dets, want_valid = batched_class_aware_nms(
        boxes, CFG.get("conf_threshold", 0.25), 0.45,
        top_k=512, max_detections=100)
    np.testing.assert_array_equal(np.asarray(got_valid), np.asarray(want_valid))
    np.testing.assert_allclose(np.asarray(got_dets), np.asarray(want_dets),
                               atol=1e-5)


def test_fold_batchnorm_numerical_equality(model_and_vars):
    from podtpu.export.npu import fold_batchnorm

    model, variables, _ = model_and_vars
    folded = fold_batchnorm(variables)
    # BN params really were rewritten to identity
    bn = folded["params"]["stem"]["bn"]
    assert np.allclose(bn["scale"], 1.0)
    assert np.allclose(folded["batch_stats"]["stem"]["bn"]["var"], 1.0)

    x = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32))
    want = model.apply(variables, x, train=False)
    got = model.apply(folded, x, train=False)
    for g, w in zip(got, want):
        scale = max(float(np.abs(np.asarray(w)).max()), 1e-3)
        assert float(np.abs(np.asarray(g) - np.asarray(w)).max()) / scale < 1e-5


def test_fold_batchnorm_nontrivial_stats(model_and_vars):
    """Folding must stay exact for non-identity running stats."""
    import jax as _jax

    from podtpu.export.npu import fold_batchnorm

    model, variables, _ = model_and_vars
    rng = np.random.default_rng(9)
    stats = _jax.tree_util.tree_map(
        lambda a: np.asarray(a) + rng.uniform(0.1, 0.5, a.shape).astype(np.float32),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}
    folded = fold_batchnorm(variables)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    want = model.apply(variables, x, train=False)
    got = model.apply(folded, x, train=False)
    for g, w in zip(got, want):
        scale = max(float(np.abs(np.asarray(w)).max()), 1e-3)
        assert float(np.abs(np.asarray(g) - np.asarray(w)).max()) / scale < 1e-5


def test_npu_validation_pass_and_fail(model_and_vars, tmp_path):
    from podtpu.export.npu import (
        NPUValidationError,
        annotate_for_npu,
        validate_for_npu,
    )
    from podtpu.export.stablehlo import export_serving

    model, variables, _ = model_and_vars
    fwd = str(tmp_path / "fwd.stablehlo")
    export_stablehlo(model, variables, (1, 64, 64, 3), fwd)
    report = validate_for_npu(fwd)  # forward graph: all ops whitelisted
    assert report["ok"] and not report["unsupported"]

    srv = str(tmp_path / "serve.stablehlo")
    export_serving(model, variables, CFG, (1, 64, 64, 3), srv)
    with pytest.raises(NPUValidationError) as ei:
        validate_for_npu(srv)  # NMS control flow is off-whitelist
    assert "stablehlo.while" in ei.value.unsupported
    soft = validate_for_npu(srv, strict=False)
    assert not soft["ok"]

    # annotation map: conv layer count matches the model (21 ConvBn + 3 head
    # convs in YoloV4Tiny) plus the 3 maxpools
    ann = annotate_for_npu(fwd, str(tmp_path / "ann.json"))
    convs = [l for l in ann["layers"] if l["op"] == "stablehlo.convolution"]
    pools = [l for l in ann["layers"] if l["op"] == "stablehlo.reduce_window"]
    assert len(convs) == 24
    assert len(pools) == 3
    assert all(l["name"].isidentifier() for l in ann["layers"])
    import json as _json
    with open(tmp_path / "ann.json") as f:
        assert _json.load(f)["num_layers"] == ann["num_layers"]


def test_npz_weights_roundtrip(tmp_path):
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    path = str(tmp_path / "w.npz")
    save_npz_weights(state, path)

    state2 = create_train_state(CFG, jax.random.PRNGKey(1))  # different init
    state2 = load_npz_weights(state2, path)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_partial_load(tmp_path):
    state = create_train_state(CFG, jax.random.PRNGKey(0))
    path = str(tmp_path / "w.npz")
    save_npz_weights(state, path)

    cfg5 = dict(CFG, num_classes=5)  # head shapes differ
    state5 = create_train_state(cfg5, jax.random.PRNGKey(1))
    with pytest.raises(Exception):
        load_npz_weights(state5, path)  # strict must fail on shape mismatch
