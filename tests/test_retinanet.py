"""RetinaNet family tests: anchors, assignment, loss/grads, decode, train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from podtpu.ops.retina import (
    all_anchors,
    assign_targets,
    decode_retinanet,
    level_anchors,
    retinanet_loss,
)

pytestmark = pytest.mark.slow

CFG = {
    "model": "retinanet",
    "num_classes": 4,
    "input_size": 128,
    "in_channels": 3,
    "compute_dtype": "float32",
    "conf_threshold": 0.25,
    "max_annots": 8,
    "optimizer": "sgd",
    "optimizer_options": {"lr": 1e-3, "momentum": 0.9},
    "top_k_candidates": 64,
    "max_detections": 10,
}
STRIDES = (8, 16, 32, 64, 128)


def _n_anchors(size):
    return sum((size // s) ** 2 * 9 for s in STRIDES)


def test_level_anchor_geometry():
    a = np.asarray(level_anchors(8, 4, 4))
    assert a.shape == (4 * 4 * 9, 4)
    # first cell center at (4, 4); base size 32 for the square ratio octave 0
    assert a[0, 0] == pytest.approx(4.0) and a[0, 1] == pytest.approx(4.0)
    sq = a[:9][np.isclose(a[:9, 2], a[:9, 3])]
    assert any(np.isclose(sq[:, 2], 32.0))


def test_assignment_pos_neg_ignore():
    size = 128
    anchors = all_anchors(size, STRIDES)
    target = -np.ones((8, 5), np.float32)
    target[0] = [0.5, 0.5, 0.25, 0.25, 2]  # 32x32 box in the center
    cls_t, box_t, pos, valid = assign_targets(
        anchors, jnp.asarray(target), 4, size
    )
    assert float(pos.sum()) >= 1  # the matching anchors exist
    # positives carry the one-hot class
    pos_rows = np.asarray(cls_t)[np.asarray(pos) > 0]
    assert (pos_rows.argmax(-1) == 2).all()
    # ignore band exists: valid < all
    assert float(valid.sum()) < anchors.shape[0]
    # deltas of the best anchor should be small
    best = np.argmax(np.asarray(pos) * (1 - np.abs(np.asarray(box_t)).sum(-1)))
    assert np.abs(np.asarray(box_t)[best]).max() < 2.0


def test_assignment_empty_image():
    anchors = all_anchors(128, STRIDES)
    target = -np.ones((8, 5), np.float32)
    cls_t, box_t, pos, valid = assign_targets(
        anchors, jnp.asarray(target), 4, 128
    )
    assert float(pos.sum()) == 0
    assert float(valid.sum()) == anchors.shape[0]  # everything negative
    assert np.asarray(cls_t).sum() == 0


@pytest.fixture(scope="module")
def model_outputs():
    from podtpu.models import build_model

    model = build_model(CFG)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    return model, variables, outs


def test_head_shapes(model_outputs):
    _, _, outs = model_outputs
    assert len(outs) == 5
    sizes = [128 // s for s in STRIDES]
    for (cls, box), hw in zip(outs, sizes):
        assert cls.shape == (2, hw, hw, 9 * 4)
        assert box.shape == (2, hw, hw, 9 * 4 // 4 * 4 // 9 * 9) or box.shape == (2, hw, hw, 36)


def test_prior_bias_makes_low_initial_scores(model_outputs):
    _, _, outs = model_outputs
    probs = jax.nn.sigmoid(outs[0][0])
    assert float(probs.mean()) < 0.02  # pi = 0.01 prior


def test_loss_and_grads(model_outputs):
    model, variables, outs = model_outputs
    target = -np.ones((2, 8, 5), np.float32)
    target[0, 0] = [0.5, 0.5, 0.3, 0.3, 1]
    target[1, 0] = [0.3, 0.3, 0.2, 0.4, 3]
    loss = retinanet_loss(outs, jnp.asarray(target), 4, 128)
    assert np.isfinite(float(loss))

    def f(params):
        o = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.zeros((2, 128, 128, 3)), train=False,
        )
        return retinanet_loss(o, jnp.asarray(target), 4, 128)

    g = jax.grad(f)(variables["params"])
    gn = jnp.sqrt(sum(jnp.sum(v**2) for v in jax.tree_util.tree_leaves(g)))
    assert bool(jnp.isfinite(gn))


def test_decode_shape(model_outputs):
    _, _, outs = model_outputs
    d = decode_retinanet(outs, 4, 128)
    assert d.shape == (2, _n_anchors(128), 6)
    assert bool(jnp.all(jnp.isfinite(d)))


def test_train_step_loss_decreases():
    from podtpu.train.state import create_train_state
    from podtpu.train.steps import make_train_step

    state = create_train_state(CFG, jax.random.PRNGKey(0))
    step = make_train_step(CFG, mesh=None, donate=False)
    r = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(r.uniform(0, 1, (2, 128, 128, 3)).astype(np.float32)),
        "annot": jnp.asarray(
            np.stack([
                np.concatenate([[[0.5, 0.5, 0.4, 0.4, 1]],
                                -np.ones((7, 5))], 0),
                np.concatenate([[[0.4, 0.6, 0.3, 0.3, 2]],
                                -np.ones((7, 5))], 0),
            ]).astype(np.float32)
        ),
    }
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(6):
        state, m = step(state, batch, rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
