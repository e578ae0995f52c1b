"""Loss parity against golden scalars produced by running the reference's
torch losses (models/loss/*.py) on the exact same inputs (torch cpu, fp32).

The inputs are regenerated here from the same seeded numpy streams used when
the goldens were recorded; the only transformation is the NCHW -> NHWC layout
transpose (channel c = a*(5+C)+e maps to the same anchor/element slot)."""

import jax.numpy as jnp
import numpy as np
import pytest

from podtpu.losses import (
    yolov1_loss,
    yolov2_loss,
    yolov2_loss_v2,
    yolov3_loss,
    yolov3_loss_v2,
    yolov3_loss_v3,
)
from tests.helpers import (
    VOC_ANCHORS,
    VOC_SCALED_ANCHORS,
    make_targets,
    nchw_to_nhwc,
    normal,
)

C, B, T = 20, 4, 8


@pytest.fixture(scope="module")
def v2_inputs():
    pred = normal((B, 5 * (5 + C), 13, 13), 100)
    tgt = make_targets(B, T, C, 7)
    return jnp.asarray(nchw_to_nhwc(pred)), jnp.asarray(tgt)


@pytest.fixture(scope="module")
def v3_inputs():
    preds = [
        jnp.asarray(nchw_to_nhwc(normal((B, 3 * (5 + C), hw, hw), 200 + hw)))
        for hw in (52, 26, 13)
    ]
    tgt = jnp.asarray(make_targets(B, T, C, 11))
    return preds, tgt


def test_yolov2_loss_golden(v2_inputs):
    pred, tgt = v2_inputs
    got = float(yolov2_loss(pred, tgt, C, VOC_SCALED_ANCHORS))
    assert got == pytest.approx(427.0644226074219, rel=1e-4)


def test_yolov2_loss_v2_golden(v2_inputs):
    pred, tgt = v2_inputs
    got = float(yolov2_loss_v2(pred, tgt, C, VOC_SCALED_ANCHORS))
    assert got == pytest.approx(322.930908203125, rel=1e-4)


@pytest.mark.slow
def test_yolov3_loss_golden(v3_inputs):
    preds, tgt = v3_inputs
    got = float(yolov3_loss(preds, tgt, C, VOC_ANCHORS, 416))
    assert got == pytest.approx(3222.644287109375, rel=1e-4)


@pytest.mark.slow
def test_yolov3_loss_v2_golden(v3_inputs):
    preds, tgt = v3_inputs
    got = float(yolov3_loss_v2(preds, tgt, C, VOC_ANCHORS, 416))
    assert got == pytest.approx(3246.80859375, rel=1e-4)


@pytest.mark.slow
def test_yolov3_loss_v3_golden(v3_inputs):
    preds, tgt = v3_inputs
    got = float(yolov3_loss_v3(preds, tgt, C, VOC_ANCHORS, 416))
    assert got == pytest.approx(8684.6591796875, rel=1e-4)


def test_yolov1_loss_golden():
    pred = jnp.asarray(normal((B, 7 * 7 * (2 * 5 + C)), 300))
    tgt = jnp.asarray(make_targets(B, T, C, 13))
    got = float(yolov1_loss(pred, tgt, C, 2))
    assert got == pytest.approx(123.91336822509766, rel=1e-4)


@pytest.mark.slow
def test_losses_finite_gradients(v3_inputs):
    """Masked CIoU must not leak NaNs into gradients (the double-where trap)."""
    import jax

    preds, tgt = v3_inputs

    def f(ps):
        return yolov3_loss_v2(ps, tgt, C, VOC_ANCHORS, 416)

    grads = jax.grad(f)(preds)
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g)))


@pytest.mark.slow  # full train-step jit compile
def test_empty_batch_no_nan():
    """A batch with zero valid annotations must produce a finite loss."""
    tgt = jnp.full((B, T, 5), -1.0)
    preds = [
        jnp.asarray(nchw_to_nhwc(normal((B, 3 * (5 + C), hw, hw), 400 + hw)))
        for hw in (52, 26, 13)
    ]
    loss = yolov3_loss_v2(preds, tgt, C, VOC_ANCHORS, 416)
    assert bool(jnp.isfinite(loss))
