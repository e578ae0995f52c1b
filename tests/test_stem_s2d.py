"""Space-to-depth stem reparameterization (PODTPU_STEM=s2d) parity.

The 3x3 stride-2 pad-1 stem conv and its s2d form (2x2 stride-1 conv on
the space-to-depth input, podtpu/models/layers.py::_s2d_conv) compute the
same 27 products per output element — forward equality is limited only by
f32 summation order, and gradients map back through the kernel transform
onto the SAME [3,3,C,F] parameter, so checkpoints are interchangeable.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from podtpu.models.layers import _s2d_conv
from podtpu.models.yolov4_tiny import YoloV4Tiny


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape", [(2, 16, 16, 3), (1, 32, 20, 3),
                                   (3, 8, 8, 5)])
def test_s2d_conv_matches_dense(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, shape[-1], 7)), jnp.float32)
    a = _ref_conv(x, w)
    b = _s2d_conv(x, w, jnp.float32)
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_s2d_gradients_match_dense():
    """d(loss)/d(kernel) and d(loss)/d(x) agree through the reparam."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, 8)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(2, 8, 8, 8)), jnp.float32)

    ga = jax.grad(lambda x, w: jnp.sum(_ref_conv(x, w) * cot), (0, 1))(x, w)
    gb = jax.grad(lambda x, w: jnp.sum(_s2d_conv(x, w, jnp.float32) * cot),
                  (0, 1))(x, w)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_model_forward_parity(monkeypatch):
    """Full yolov4-tiny forward, same params, stem path toggled by env."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    model = YoloV4Tiny(num_classes=4)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    monkeypatch.delenv("PODTPU_STEM", raising=False)
    base_eval = model.apply(variables, x, train=False)
    base_train, base_upd = model.apply(x=x, train=True,
                                       variables=variables,
                                       mutable=["batch_stats"])

    monkeypatch.setenv("PODTPU_STEM", "s2d")
    s2d_eval = model.apply(variables, x, train=False)
    s2d_train, s2d_upd = model.apply(x=x, train=True,
                                     variables=variables,
                                     mutable=["batch_stats"])

    for a, b in zip(base_eval, s2d_eval):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
    for a, b in zip(base_train, s2d_train):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
    ja = jax.tree_util.tree_leaves(base_upd)
    jb = jax.tree_util.tree_leaves(s2d_upd)
    for a, b in zip(ja, jb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
