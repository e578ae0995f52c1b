"""pretrain_darknet.py CLI smoke: imagefolder -> classifier epoch -> npz
-> detector partial load (the reference's tiny-imagenet backbone
pretraining loop, models/backbone/darknet.py:96-150)."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.join(os.path.dirname(__file__), "..")


def _make_imagefolder(root, classes=2, per_class=4, size=64):
    import cv2

    rng = np.random.default_rng(0)
    for c in range(classes):
        d = os.path.join(root, f"class{c}")
        os.makedirs(d)
        for i in range(per_class):
            cv2.imwrite(os.path.join(d, f"{i}.jpg"),
                        rng.integers(0, 255, (size, size, 3)).astype(np.uint8))


def test_pretrain_smoke(tmp_path):
    data = tmp_path / "imgs"
    data.mkdir()
    _make_imagefolder(str(data))
    out = tmp_path / "w.npz"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "pretrain_darknet.py"),
         "--data", str(data), "--size", "64", "--batch", "4",
         "--epochs", "1", "--out", str(out), "--platform", "cpu"],
        capture_output=True, text=True, timeout=420,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert out.exists()

    # the npz partial-loads as a detector backbone (shared 'backbone' scope)
    import jax

    jax.config.update("jax_platforms", "cpu")
    from podtpu.config import get_configs
    from podtpu.train.state import create_train_state

    cfg = get_configs(os.path.join(REPO, "configs", "yolov2_voc.yaml"))
    cfg["input_size"] = 64
    rng = jax.random.PRNGKey(0)
    init_state = create_train_state(dict(cfg), rng)
    cfg["backbone_pretrained"] = str(out)
    state = create_train_state(cfg, rng)
    stem = np.asarray(state.params["backbone"]["stage0"]["conv0"]["conv"]["kernel"])
    init_stem = np.asarray(
        init_state.params["backbone"]["stage0"]["conv0"]["conv"]["kernel"])
    assert stem.shape == init_stem.shape
    assert not np.array_equal(stem, init_stem)  # pretrained weights applied
