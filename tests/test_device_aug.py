"""On-device augmentation tests: HSV round trip, flip semantics, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from podtpu.data.device_aug import device_augment, hsv_to_rgb, rgb_to_hsv


def test_hsv_roundtrip():
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 1, (4, 8, 8, 3)).astype(np.float32))
    back = hsv_to_rgb(rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-5)


def test_flip_moves_boxes():
    imgs = jnp.zeros((2, 8, 8, 3))
    imgs = imgs.at[:, :, 0, 0].set(1.0)  # bright left column
    annots = -np.ones((2, 3, 5), np.float32)
    annots[:, 0] = [0.25, 0.5, 0.2, 0.2, 1]
    out_i, out_a = device_augment(
        jax.random.PRNGKey(0), imgs, jnp.asarray(annots),
        hgain=0.0, sgain=0.0, vgain=0.0, flip_p=1.0,
    )
    # flipped: bright column moves to the right edge; cx mirrors
    assert float(out_i[0, 0, -1, 0]) > 0.5
    assert float(out_a[0, 0, 0]) == pytest.approx(0.75, abs=1e-6)
    # padding rows untouched
    np.testing.assert_array_equal(np.asarray(out_a[0, 1]), annots[0, 1])


def test_no_op_when_gains_zero():
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
    annots = jnp.asarray(-np.ones((2, 2, 5), np.float32))
    out_i, out_a = device_augment(
        jax.random.PRNGKey(0), imgs, annots,
        hgain=0.0, sgain=0.0, vgain=0.0, flip_p=0.0,
    )
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(imgs), atol=1e-5)


def test_deterministic_per_key():
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
    annots = jnp.asarray(-np.ones((2, 2, 5), np.float32))
    a = device_augment(jax.random.PRNGKey(7), imgs, annots)
    b = device_augment(jax.random.PRNGKey(7), imgs, annots)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    c = device_augment(jax.random.PRNGKey(8), imgs, annots)
    assert not np.array_equal(np.asarray(a[0]), np.asarray(c[0]))


@pytest.mark.slow
def test_device_augment_wired_into_train_step():
    import numpy as np

    from tests.test_train import TINY_CFG, tiny_batch
    from podtpu.train.state import create_train_state
    from podtpu.train.steps import make_train_step

    cfg = dict(TINY_CFG, device_augment=True)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, mesh=None, donate=False)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch().items()}
    s2, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    # photometric host stages disabled when device_augment is on
    from podtpu.data.dataset import build_datasets
    from podtpu.data.synthetic import generate
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        info = generate(d, n_train=2, n_val=1, size=64, num_classes=2)
        c = dict(cfg, train_list=info["train_list"],
                 val_list=info["val_list"], input_size=64)
        train_ds, _ = build_datasets(c)
        assert train_ds.photometric is False
