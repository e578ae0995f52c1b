"""Model shape checks — the analog of the reference's __main__ smoke blocks
(yolov3.py:94-112, yolov4_tiny.py:114-129, darknet.py:164-188)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from podtpu.models import Darknet19, YoloV1, YoloV2, YoloV3, YoloV4Tiny
from podtpu.models.layers import passthrough_reorg, upsample_nearest_2x


pytestmark = pytest.mark.slow

def _init_and_apply(model, shape):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model.apply(variables, x, train=False), variables


def test_darknet19_feature_taps():
    model = Darknet19(out_indices=(3, 4, 5))
    feats, _ = _init_and_apply(model, (1, 416, 416, 3))
    assert [f.shape for f in feats] == [
        (1, 52, 52, 256), (1, 26, 26, 512), (1, 13, 13, 1024)
    ]


def test_yolov2_head_shape():
    model = YoloV2(num_classes=20, num_anchors=5)
    out, variables = _init_and_apply(model, (1, 416, 416, 3))
    assert out.shape == (1, 13, 13, 5 * 25)
    # param count comparable to reference torchinfo (~50.6M for yolov2)
    n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 45_000_000 < n < 55_000_000


def test_yolov3_head_shapes_and_params():
    model = YoloV3(num_classes=20)
    (p3, p4, p5), variables = _init_and_apply(model, (1, 416, 416, 3))
    assert p3.shape == (1, 52, 52, 75)
    assert p4.shape == (1, 26, 26, 75)
    assert p5.shape == (1, 13, 13, 75)
    n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 33_000_000 < n < 38_000_000  # darknet19+FPN ~35.3M


def test_yolov4_tiny_shapes():
    model = YoloV4Tiny(num_classes=20)
    (p3, p4, p5), variables = _init_and_apply(model, (1, 416, 416, 3))
    assert p3.shape == (1, 52, 52, 75)
    assert p4.shape == (1, 26, 26, 75)
    assert p5.shape == (1, 13, 13, 75)
    n = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    assert 5_000_000 < n < 8_000_000  # CSP-tiny ~6.3M


def test_yolov1_shape_448():
    model = YoloV1(num_classes=20, num_boxes=2)
    out, _ = _init_and_apply(model, (1, 448, 448, 3))
    assert out.shape == (1, 7 * 7 * 30)


def test_batchnorm_mixed_var_clamp():
    """E[x^2]-E[x]^2 cancels negative in f32 for large-mean near-constant
    channels; without the stock-flax clamp rsqrt(var+eps) goes NaN."""
    from podtpu.models.layers import BatchNormMixed

    bn = BatchNormMixed(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(100.0 + 1e-4 * rng.normal(size=(8, 4, 4, 16)),
                    jnp.float32)
    variables = bn.init(jax.random.PRNGKey(0), x, train=True)
    y, updates = bn.apply(variables, x, train=True,
                          mutable=["batch_stats"])
    assert np.isfinite(np.asarray(y)).all()
    assert (np.asarray(updates["batch_stats"]["var"]) >= 0).all()


def test_passthrough_reorg_matches_torch_view():
    """The v2 reorg must equal torch's NCHW .view(bs,-1,h/2,w/2)."""
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 4, 6, 3)).astype(np.float32)  # NHWC
    got = np.asarray(passthrough_reorg(jnp.asarray(x)))
    nchw = np.transpose(x, (0, 3, 1, 2))
    want = nchw.reshape(2, -1, 2, 3)  # torch .view semantics (row-major)
    want = np.transpose(want, (0, 2, 3, 1))
    np.testing.assert_array_equal(got, want)


def test_upsample_nearest():
    x = jnp.asarray(np.arange(8).reshape(1, 2, 2, 2).astype(np.float32))
    up = upsample_nearest_2x(x)
    assert up.shape == (1, 4, 4, 2)
    np.testing.assert_array_equal(np.asarray(up[0, :2, :2, 0]),
                                  np.full((2, 2), float(x[0, 0, 0, 0])))


def test_stride2_conv_matches_torch_geometry():
    """Explicit (1,1) padding at stride 2 must produce torch's H/2 output
    from even inputs (XLA 'SAME' would align windows differently)."""
    from podtpu.models.layers import ConvBnAct

    model = ConvBnAct(8, 3, strides=2)
    x = jnp.zeros((1, 416, 416, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 208, 208, 8)


def test_pool_variants_forward_and_grad_match():
    """PODTPU_POOL=reshape must match reduce_window pooling exactly on
    tie-free input (forward always; backward when no 2x2 window has
    duplicated maxima — measure-zero for random floats)."""
    import os

    import jax
    import jax.numpy as jnp

    from podtpu.models import layers

    x = jnp.asarray(np.random.default_rng(7).normal(
        size=(2, 16, 16, 8)).astype(np.float32))

    def run(mode):
        os.environ["PODTPU_POOL"] = mode
        try:
            f = lambda a: jnp.sum(layers.max_pool_2x2(a) ** 2)
            return layers.max_pool_2x2(x), jax.grad(f)(x)
        finally:
            os.environ.pop("PODTPU_POOL", None)

    y_w, g_w = run("window")
    y_r, g_r = run("reshape")
    np.testing.assert_array_equal(np.asarray(y_w), np.asarray(y_r))
    np.testing.assert_allclose(np.asarray(g_w), np.asarray(g_r), atol=1e-6)
