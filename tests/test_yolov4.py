"""YOLOv4 (full) family tests: topology, shapes, loss/decode/train wiring.

The reference lists YOLOv4 as an unchecked TODO (README.md:13); podtpu
completes it (podtpu/models/yolov4.py). It shares the v3-family contract —
three NHWC heads of 3*(5+C) channels at strides 8/16/32, yolov3_loss_v2,
decode_yolov3 — so these tests focus on the new topology and the end-to-end
wiring, not on loss/decode semantics (locked by goldens elsewhere).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# Heavy (~64M-param init + full-model applies): slow tier, like
# test_retinanet.py — the fast loop covers the shared loss/decode/NMS stack.
pytestmark = pytest.mark.slow

CFG = {
    "model": "yolov4",
    "num_classes": 4,
    "input_size": 128,
    "in_channels": 3,
    "compute_dtype": "float32",
    "conf_threshold": 0.25,
    "max_annots": 8,
    "anchors": [[12, 16], [19, 36], [40, 28], [36, 75], [76, 55], [72, 146],
                [142, 110], [192, 243], [459, 401]],
    "optimizer": "sgd",
    "optimizer_options": {"lr": 1e-4, "momentum": 0.9},
    "top_k_candidates": 64,
    "max_detections": 10,
}


@pytest.fixture(scope="module")
def model_and_vars():
    from podtpu.models import build_model

    model = build_model(CFG)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def test_head_shapes(model_and_vars):
    model, variables = model_and_vars
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    p3, p4, p5 = model.apply(variables, x, train=False)
    out_ch = 3 * (4 + 5)
    assert p3.shape == (2, 16, 16, out_ch)   # stride 8
    assert p4.shape == (2, 8, 8, out_ch)     # stride 16
    assert p5.shape == (2, 4, 4, out_ch)     # stride 32
    for p in (p3, p4, p5):
        assert p.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(p)))


def test_param_count_matches_yolov4_scale(model_and_vars):
    _, variables = model_and_vars
    n = sum(int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(variables["params"]))
    # canonical YOLOv4 is ~64M params (backbone ~26.6M); the head conv
    # count varies only with num_classes
    assert 55e6 < n < 75e6


def test_backbone_taps(model_and_vars):
    from podtpu.models.yolov4 import CSPDarknet53

    m = CSPDarknet53()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    c3, c4, c5 = m.apply(v, x, train=False)
    assert c3.shape == (1, 8, 8, 256)
    assert c4.shape == (1, 4, 4, 512)
    assert c5.shape == (1, 2, 2, 1024)


def test_classifier_and_backbone_pretrain_partial_load(tmp_path):
    """CSPDarknet53Classifier (pretrain_darknet.py --model cspdarknet53)
    shares the `backbone` scope with YoloV4, so its npz partial-loads."""
    from podtpu.export.weights import SEP
    from podtpu.models.yolov4 import CSPDarknet53Classifier
    from podtpu.train.state import create_train_state

    clf = CSPDarknet53Classifier(num_classes=7)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = clf.init(jax.random.PRNGKey(0), x, train=False)
    logits = clf.apply(v, x, train=False)
    assert logits.shape == (1, 7)

    arrays = {}
    flat = jax.tree_util.tree_flatten_with_path(v["params"]["backbone"])[0]
    for path, leaf in flat:
        key = "params" + SEP + "backbone" + SEP + SEP.join(
            p.key for p in path)
        arrays[key] = np.full(leaf.shape, 0.123, leaf.dtype)
    npz = str(tmp_path / "csp_bb.npz")
    np.savez(npz, **arrays)

    cfg = dict(CFG, input_size=64, backbone_pretrained=npz)
    loaded = create_train_state(cfg, jax.random.PRNGKey(0))
    bb = jax.tree_util.tree_leaves(loaded.params["backbone"])
    assert all(np.allclose(np.asarray(l), 0.123) for l in bb)
    head = jax.tree_util.tree_leaves(loaded.params["p5_pred"])
    assert not np.allclose(np.asarray(head[0]), 0.123)


def test_mish():
    from podtpu.models.yolov4 import mish

    x = jnp.asarray([-20.0, -1.0, 0.0, 1.0, 20.0])
    y = np.asarray(mish(x))
    ref = np.asarray(x) * np.tanh(np.log1p(np.exp(np.minimum(np.asarray(x), 30))))
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)
    assert np.isfinite(y).all()


def test_loss_decode_nms_wiring(model_and_vars):
    from podtpu.losses import build_loss
    from podtpu.ops.nms import batched_class_aware_nms
    from podtpu.train.steps import make_decoder

    model, variables = model_and_vars
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (2, 128, 128, 3))
        .astype(np.float32))
    preds = model.apply(variables, x, train=False)
    target = -np.ones((2, 8, 5), np.float32)
    target[0, 0] = [0.5, 0.5, 0.3, 0.3, 1]
    loss = build_loss(CFG)(preds, jnp.asarray(target))
    assert np.isfinite(float(loss))
    boxes = make_decoder(CFG)(preds)
    n = (16 * 16 + 8 * 8 + 4 * 4) * 3
    assert boxes.shape == (2, n, 6)
    dets, valid = batched_class_aware_nms(boxes, 0.25, 0.45, top_k=64,
                                          max_detections=10)
    assert dets.shape == (2, 10, 6) and valid.shape == (2, 10)


def test_train_step_loss_decreases():
    from podtpu.train.state import create_train_state
    from podtpu.train.steps import make_train_step

    state = create_train_state(CFG, jax.random.PRNGKey(0))
    step = make_train_step(CFG, mesh=None, donate=False)
    r = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(r.uniform(0, 1, (2, 128, 128, 3))
                           .astype(np.float32)),
        "annot": jnp.asarray(np.stack([
            np.concatenate([[[0.5, 0.5, 0.4, 0.4, 1]], -np.ones((7, 5))], 0),
            np.concatenate([[[0.4, 0.6, 0.3, 0.3, 2]], -np.ones((7, 5))], 0),
        ]).astype(np.float32)),
    }
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(4):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
