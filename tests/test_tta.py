"""Test-time augmentation (cfg ``tta``): hflip forward merged pre-NMS.

Beyond the reference (it has no TTA surface). Locks: flip-equivariance of
the TTA serve graph (dets(flip(x)) mirrors dets(x) — the candidate sets
are mirrors of each other by construction), disabled == plain postprocess,
loss invariance in the eval step, and artifact bake-in.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from podtpu.models import YoloV4Tiny
from podtpu.train.steps import make_serve_fn, tta_options

CFG = {
    "model": "yolov4-tiny",
    "num_classes": 3,
    "input_size": 64,
    "in_channels": 3,
    "compute_dtype": "float32",
    "anchors": [[4, 5], [6, 8], [10, 9], [12, 16], [18, 14],
                [20, 24], [32, 28], [40, 44], [56, 52]],
    "conf_threshold": 0.1,
    "top_k_candidates": 32,
    "max_detections": 10,
    "max_annots": 8,
    "optimizer": "sgd",
    "optimizer_options": {"lr": 1e-3, "momentum": 0.9},
}


def test_tta_options_parsing():
    assert tta_options({}) is None
    assert tta_options({"tta": False}) is None
    assert tta_options({"tta": True}) == {"hflip": True, "scales": ()}
    assert tta_options({"tta": {"hflip": False}}) == \
        {"hflip": False, "scales": ()}


@pytest.fixture(scope="module")
def model_and_vars():
    model = YoloV4Tiny(num_classes=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    return model, variables


def _serve(cfg, model, variables):
    return jax.jit(make_serve_fn(
        cfg, lambda x: model.apply(variables, x, train=False)))


def test_tta_flip_equivariance(model_and_vars):
    """TTA detections on the mirrored image are the mirror of the original's
    — {f(x), mirror(f(flip(x)))} and {f(flip(x)), mirror(f(x))} are mirror
    sets, and the class-aware NMS keeps mirror-consistent survivors."""
    model, variables = model_and_vars
    serve = _serve({**CFG, "tta": True}, model, variables)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    dets, valid = map(np.asarray, serve(x))
    dets_f, valid_f = map(np.asarray, serve(jnp.flip(x, axis=2)))

    assert valid.sum() > 0  # permissive conf on a random net finds boxes
    np.testing.assert_array_equal(valid, valid_f)
    mirrored = dets_f.copy()
    mirrored[..., 0] = CFG["input_size"] - mirrored[..., 0]
    for b in range(dets.shape[0]):
        a = dets[b][valid[b]]
        m = mirrored[b][valid_f[b]]
        # same survivor sets (order can differ on mirrored score ties)
        np.testing.assert_allclose(
            np.sort(a, axis=0), np.sort(m, axis=0), rtol=1e-5, atol=1e-4)


@pytest.mark.slow
def test_tta_disabled_matches_plain_postprocess(model_and_vars):
    model, variables = model_and_vars
    from podtpu.train.steps import make_postprocess

    serve = _serve(CFG, model, variables)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    dets, valid = serve(x)
    # same whole-graph jit so XLA compiles the identical program
    plain = jax.jit(lambda x: make_postprocess(CFG)(
        model.apply(variables, x, train=False)))
    want_dets, want_valid = plain(x)
    np.testing.assert_array_equal(np.asarray(dets), np.asarray(want_dets))
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(want_valid))


@pytest.mark.slow
def test_tta_changes_detections_and_keeps_loss(model_and_vars):
    """The eval step's loss comes from the un-augmented forward; TTA only
    affects the detection set."""
    from podtpu.train.state import create_train_state
    from podtpu.train.steps import make_eval_step

    state = create_train_state(CFG, jax.random.PRNGKey(0))
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3)))
    annot = -np.ones((2, 8, 5), np.float32)
    annot[:, 0] = [0.5, 0.5, 0.4, 0.4, 1]
    batch = {"img": x, "annot": annot}

    plain = make_eval_step(CFG)
    tta = make_eval_step({**CFG, "tta": True})
    loss_p, dets_p, valid_p = plain(state, batch)
    loss_t, dets_t, valid_t = tta(state, batch)
    assert float(loss_p) == pytest.approx(float(loss_t), rel=1e-6)
    assert not (np.array_equal(np.asarray(dets_p), np.asarray(dets_t))
                and np.array_equal(np.asarray(valid_p), np.asarray(valid_t)))


@pytest.mark.slow
def test_tta_bakes_into_serving_artifact(model_and_vars, tmp_path):
    from podtpu.export.stablehlo import export_serving, load_exported

    model, variables = model_and_vars
    cfg = {**CFG, "tta": True}
    path = str(tmp_path / "tta.stablehlo")
    export_serving(model, variables, cfg, (2, 64, 64, 3), path)
    run = load_exported(path)
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 64, 64, 3))
    dets_a, valid_a = run(x)
    dets_e, valid_e = _serve(cfg, model, variables)(x)
    np.testing.assert_allclose(np.asarray(dets_a), np.asarray(dets_e),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(valid_a), np.asarray(valid_e))


def test_tta_scale_options_parsing():
    assert tta_options({"tta": {"scales": [1.0, 0.83]}}) == \
        {"hflip": True, "scales": (0.83,)}
    assert tta_options({"tta": {"hflip": False, "scales": []}}) == \
        {"hflip": False, "scales": ()}
    with pytest.raises(ValueError, match="scales"):
        tta_options({"tta": {"scales": [1.5]}})


@pytest.mark.slow
def test_tta_scale_branch_candidates(model_and_vars):
    """The scale branch == decode(forward(same-size gray canvas with the
    top-left downscaled content)), rescaled by the exact per-axis ratio —
    locks the canvas placement, axis order, and rescale plumbing."""
    from podtpu.train.steps import make_postprocess

    model, variables = model_and_vars
    cfg = {**CFG, "tta": {"hflip": False, "scales": [0.5]}}
    serve = _serve(cfg, model, variables)
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3))
    dets, valid = serve(x)

    # manual reconstruction of the two branches
    from podtpu.train.steps import _decoder_and_nms

    decoder, nms = _decoder_and_nms(CFG)

    def manual(x):
        unit = decoder(model.apply(variables, x, train=False))
        small = jax.image.resize(x, (2, 32, 32, 3), "bilinear")
        canvas = jnp.full_like(x, 0.447).at[:, :32, :32, :].set(small)
        cands = decoder(model.apply(variables, canvas, train=False))
        cands = cands.at[..., 0].mul(2.0).at[..., 2].mul(2.0)
        cands = cands.at[..., 1].mul(2.0).at[..., 3].mul(2.0)
        return nms(jnp.concatenate([unit, cands], axis=1))

    want_dets, want_valid = jax.jit(manual)(x)
    np.testing.assert_allclose(np.asarray(dets), np.asarray(want_dets),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(want_valid))
