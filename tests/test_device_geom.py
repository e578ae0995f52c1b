"""Device-side geometric augmentation (cfg ``device_geom``).

The letterbox recipe's random affine is scale+translate only (degrees and
shear are 0 — the reference's random_perspective call,
dataset/detection/datasets.py:47-52), and the simple recipe's
RandomResizedCrop is an anisotropic scale+translate, so both are
axis-separable and run on-device as two batched matmuls
(``device_aug.separable_affine``) while the host ships un-warped pixels plus
a per-sample ``(sx, sy, bx, by)`` row. These tests lock: warp vs
cv2.warpAffine agreement, identity passthrough, host/device label equality
from the shared draw streams, and the train-step wiring.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from podtpu.data import augment as A
from podtpu.data.device_aug import separable_affine

GRAY = 114


def _cv2_warp(im_u8: np.ndarray, sx: float, sy: float, bx: float, by: float):
    m = np.array([[sx, 0.0, bx], [0.0, sy, by]], np.float64)
    return cv2.warpAffine(im_u8, m, dsize=im_u8.shape[1::-1],
                          borderValue=(GRAY, GRAY, GRAY))


def test_matches_cv2_warp_affine():
    rng = np.random.default_rng(0)
    size = 64
    imgs = rng.integers(0, 256, (5, size, size, 3), dtype=np.uint8)
    params = np.array([
        [0.6, 0.6, 10.0, -5.0],      # shrink + translate
        [1.4, 1.4, -20.0, 30.0],     # zoom-in crop
        [0.97, 0.97, 3.5, 2.25],     # near-identity, fractional offsets
        [0.5, 0.5, 40.0, 40.0],      # heavy border exposure
        [1.8, 0.7, -15.0, 6.0],      # anisotropic (RandomResizedCrop-like)
    ], np.float32)
    out = separable_affine(jnp.asarray(imgs, jnp.float32) / 255.0,
                           jnp.asarray(params))
    out = np.asarray(out) * 255.0
    for i, (sx, sy, bx, by) in enumerate(params):
        ref = _cv2_warp(imgs[i], float(sx), float(sy), float(bx), float(by))
        diff = np.abs(out[i] - ref.astype(np.float64))
        # cv2 uses 5-bit fixed-point interpolation tables; the device warp
        # is float-exact. Allow the quantization gap, require tight mean.
        assert diff.mean() < 1.0, f"sample {i}: mean {diff.mean()}"
        assert np.percentile(diff, 99) < 4.0, f"sample {i}"


def test_identity_passthrough_exact():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    geom = jnp.asarray(np.tile([1.0, 1.0, 0.0, 0.0], (2, 1)), jnp.float32)
    out = separable_affine(jnp.asarray(imgs, jnp.float32) / 255.0, geom)
    np.testing.assert_allclose(np.asarray(out) * 255.0, imgs, atol=1e-4)


def test_mixed_identity_and_warp_rows():
    """Identity rows (mosaic samples) coexist with warped rows per batch."""
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 256, (2, 48, 48, 3), dtype=np.uint8)
    geom = jnp.asarray([[1.0, 1.0, 0.0, 0.0], [0.7, 0.7, 5.0, -3.0]],
                       jnp.float32)
    out = np.asarray(
        separable_affine(jnp.asarray(imgs, jnp.float32) / 255.0, geom)
    ) * 255.0
    np.testing.assert_allclose(out[0], imgs[0], atol=1e-3)
    ref = _cv2_warp(imgs[1], 0.7, 0.7, 5.0, -3.0)
    assert np.abs(out[1] - ref.astype(np.float64)).mean() < 1.0


def test_draw_stream_parity_host_vs_device_path():
    """Same sample seed => identical affine params and identical surviving
    boxes whether the warp runs on host (random_affine) or on device."""
    rng_a = np.random.default_rng(123)
    rng_b = np.random.default_rng(123)
    boxes = np.array([[1, 5.0, 8.0, 30.0, 40.0],
                      [0, 50.0, 50.0, 62.0, 60.0]], np.float32)
    im = np.random.default_rng(0).integers(
        0, 256, (64, 64, 3), dtype=np.uint8)

    im_host, boxes_host = A.random_affine(
        im, boxes.copy(), rng_a, degrees=0.0, translate=0.1, scale=0.5,
        shear=0.0)
    m, s, (h, w) = A.draw_affine_params(
        im.shape[:2], rng_b, degrees=0.0, translate=0.1, scale=0.5,
        shear=0.0)
    boxes_dev = A.affine_boxes(boxes.copy(), m, s, w, h)
    np.testing.assert_allclose(boxes_dev, boxes_host, rtol=1e-7)
    assert m[0, 1] == 0.0 and m[1, 0] == 0.0  # separable: no shear terms

    # and the device warp of the un-warped image matches the host warp
    geom = jnp.asarray([[m[0, 0], m[1, 1], m[0, 2], m[1, 2]]], jnp.float32)
    out = np.asarray(separable_affine(
        jnp.asarray(im[None], jnp.float32) / 255.0, geom))[0] * 255.0
    assert np.abs(out - im_host.astype(np.float64)).mean() < 1.0


def test_dataset_emits_geom_and_identical_labels(tmp_path):
    from podtpu.data.dataset import YoloTxtDataset
    from podtpu.data.synthetic import generate

    info = generate(str(tmp_path), n_train=3, n_val=1, size=96,
                    num_classes=2, seed=0)
    common = dict(input_size=64, augment=True, pipeline="letterbox",
                  photometric=False, output_uint8=True)
    host_ds = YoloTxtDataset(info["train_list"], **common)
    dev_ds = YoloTxtDataset(info["train_list"], **common, device_geom=True)
    for idx in range(3):
        im_h, boxes_h = host_ds.get(idx, seed=100 + idx)
        sample = dev_ds.get(idx, seed=100 + idx)
        assert len(sample) == 3
        im_d, boxes_d, geom = sample
        np.testing.assert_allclose(boxes_d, boxes_h, rtol=1e-6)
        assert geom.shape == (4,)
        # warping the shipped image on device reproduces the host pixels
        out = np.asarray(separable_affine(
            jnp.asarray(im_d[None], jnp.float32) / 255.0,
            jnp.asarray(geom[None])))[0] * 255.0
        assert np.abs(out - im_h.astype(np.float64)).mean() < 1.5


def test_simple_pipeline_rrc_on_device(tmp_path):
    """Simple pipeline: identical RandomResizedCrop labels; pixels are the
    resize-then-crop approximation of the host's crop-then-resize."""
    from podtpu.data.dataset import YoloTxtDataset
    from podtpu.data.synthetic import generate

    info = generate(str(tmp_path), n_train=3, n_val=1, size=96,
                    num_classes=2, seed=3)
    common = dict(input_size=64, augment=True, pipeline="simple",
                  photometric=False, output_uint8=True)
    host_ds = YoloTxtDataset(info["train_list"], **common)
    dev_ds = YoloTxtDataset(info["train_list"], **common, device_geom=True)
    for idx in range(3):
        im_h, boxes_h = host_ds.get(idx, seed=200 + idx)
        im_d, boxes_d, geom = dev_ds.get(idx, seed=200 + idx)
        np.testing.assert_allclose(boxes_d, boxes_h, rtol=1e-6)
        out = np.asarray(separable_affine(
            jnp.asarray(im_d[None], jnp.float32) / 255.0,
            jnp.asarray(geom[None])))[0] * 255.0
        diff = np.abs(out - im_h.astype(np.float64))
        # double interpolation: approximate, not bit-equal
        assert diff.mean() < 12.0, f"sample {idx}: mean {diff.mean()}"


def test_loader_collates_geom(tmp_path):
    from podtpu.data.dataset import YoloTxtDataset
    from podtpu.data.loader import Loader
    from podtpu.data.synthetic import generate

    info = generate(str(tmp_path), n_train=4, n_val=1, size=96,
                    num_classes=2, seed=1)
    ds = YoloTxtDataset(info["train_list"], 64, True, "letterbox",
                        photometric=False, output_uint8=True,
                        device_geom=True)
    loader = Loader(ds, batch_size=2, shuffle=True, max_annots=8, workers=1)
    batch = next(iter(loader))
    assert batch["geom"].shape == (2, 4)
    assert batch["img"].dtype == np.uint8


@pytest.mark.slow
def test_train_step_with_device_geom():
    from tests.test_train import TINY_CFG, tiny_batch
    from podtpu.train.state import create_train_state
    from podtpu.train.steps import make_train_step

    cfg = dict(TINY_CFG, device_augment=True, device_geom=True)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, mesh=None, donate=False)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch().items()}
    batch["geom"] = jnp.asarray(
        np.tile([0.8, 0.8, 4.0, -2.0], (batch["img"].shape[0], 1)),
        jnp.float32)
    s2, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
