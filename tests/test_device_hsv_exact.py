"""cv2-faithful device HSV (cfg device_hsv: exact) vs OpenCV ground truth.

The host pipeline jitters with cv2's 8u fixed-point HSV kernels
(augment_hsv -> cv2.cvtColor/LUT). These tests pin the device
reimplementation to cv2 itself: the forward conversion must be bit-exact
(pure integer math), the inverse and the full jitter within the float
rounding of cv2's own sector kernel.
"""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from podtpu.data.device_aug import bgr_hsv_u8, exact_hsv_jitter_u8, hsv_bgr_u8


def _rand_rgb(seed, shape=(64, 64, 3)):
    return np.random.default_rng(seed).integers(0, 256, shape).astype(np.uint8)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bgr2hsv_bit_exact(seed):
    rgb = _rand_rgb(seed)
    want = cv2.cvtColor(rgb[..., ::-1], cv2.COLOR_BGR2HSV)  # on true BGR
    h, s, v = bgr_hsv_u8(jnp.asarray(rgb))
    np.testing.assert_array_equal(np.asarray(h, np.uint8), want[..., 0])
    np.testing.assert_array_equal(np.asarray(s, np.uint8), want[..., 1])
    np.testing.assert_array_equal(np.asarray(v, np.uint8), want[..., 2])


@pytest.mark.parametrize("seed", [0, 1])
def test_hsv2bgr_within_1(seed):
    rng = np.random.default_rng(seed)
    h = rng.integers(0, 180, (64, 64)).astype(np.uint8)
    s = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    v = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    want_bgr = cv2.cvtColor(np.stack([h, s, v], -1), cv2.COLOR_HSV2BGR)
    got_rgb = np.asarray(hsv_bgr_u8(jnp.asarray(h.astype(np.int32)),
                                    jnp.asarray(s.astype(np.int32)),
                                    jnp.asarray(v.astype(np.int32))))
    diff = np.abs(got_rgb[..., ::-1].astype(int) - want_bgr.astype(int))
    assert diff.max() <= 1  # ULP edges in cv2's hue-interpolated entries
    assert (diff == 0).mean() > 0.998


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_full_jitter_matches_cv2_luts(seed):
    """The analytic jitter == cv2's LUT pipeline with the same gains."""
    rng = np.random.default_rng(seed)
    rgb = _rand_rgb(100 + seed)
    gains = (rng.uniform(-1, 1, 3) * np.array([0.015, 0.7, 0.4]) + 1)

    # host oracle: the reference's exact augment_hsv body on the BGR image
    bgr = rgb[..., ::-1]
    hue, sat, val = cv2.split(cv2.cvtColor(bgr, cv2.COLOR_BGR2HSV))
    x = np.arange(256, dtype=np.float32)  # device math is f32
    lut_h = ((x * np.float32(gains[0])) % 180).astype(np.uint8)
    lut_s = np.clip(x * np.float32(gains[1]), 0, 255).astype(np.uint8)
    lut_v = np.clip(x * np.float32(gains[2]), 0, 255).astype(np.uint8)
    hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s),
                     cv2.LUT(val, lut_v)))
    want_rgb = cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)[..., ::-1]

    got = np.asarray(exact_hsv_jitter_u8(
        jnp.asarray(rgb)[None],
        jnp.asarray(gains.astype(np.float32))[None]))[0]
    diff = np.abs(got.astype(int) - want_rgb.astype(int))
    assert (diff == 0).mean() > 0.995, f"exact fraction {(diff == 0).mean()}"
    assert np.median(diff) == 0
    # residuals are single rounding steps (f32 device LUT vs f64 host LUT
    # at gain boundaries, ULP edges in the hue-interpolated entries)
    assert diff.max() <= 16 and (diff > 1).mean() < 0.005


def test_device_augment_exact_mode_runs():
    import jax

    from podtpu.data.device_aug import device_augment

    imgs = jnp.asarray(_rand_rgb(7, (2, 32, 32, 3)).astype(np.float32) / 255.0)
    annots = jnp.asarray(np.array(
        [[[0.25, 0.5, 0.2, 0.2, 1.0]] + [[-1] * 5] * 3,
         [[-1] * 5] * 4], np.float32))
    out, ann = device_augment(jax.random.PRNGKey(0), imgs, annots,
                              hsv="exact")
    assert out.shape == imgs.shape and out.dtype == jnp.float32
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # padding rows untouched
    np.testing.assert_array_equal(np.asarray(ann[1]), np.asarray(annots[1]))
