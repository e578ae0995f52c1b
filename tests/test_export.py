"""Export-path tests: StableHLO round trip, weights npz round trip/partial."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from podtpu.export.stablehlo import export_stablehlo, inspect_exported, load_exported
from podtpu.export.weights import load_npz_weights, save_npz_weights
from podtpu.models import YoloV4Tiny
from podtpu.train.state import create_train_state

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
