"""Every shipped config must build end-to-end (the reference ships 8 ready
recipes under configs/ — yaml_helper.get_configs feeds them straight into
the train scripts, so a config that doesn't build is a broken deliverable).

Uses jax.eval_shape for the model init so the whole directory checks in
seconds without running any conv FLOPs.
"""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from podtpu.config import get_configs
from podtpu.losses import build_loss
from podtpu.models.factory import build_model
from podtpu.train.optim import build_optimizer
from podtpu.train.schedule import build_schedule

CONFIGS = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "..", "configs", "*.yaml")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds(path):
    cfg = get_configs(path)
    model = build_model(cfg)
    size = int(cfg["input_size"])
    dummy = jnp.zeros((1, size, size, cfg["in_channels"]), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), dummy)
    assert "params" in variables
    # loss / optimizer / schedule builders accept the config as-is
    assert callable(build_loss(cfg))
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros((1,), jnp.float32), variables["params"])
    tx = build_optimizer(cfg, params)
    tx.init(params)
    sched = build_schedule(cfg)
    lr0 = float(sched(jnp.asarray(0)))
    assert lr0 >= 0.0


def test_all_reference_configs_mirrored():
    """The reference's 8 config recipes all have a same-named counterpart
    (reference: configs/*.yaml)."""
    ours = {os.path.basename(p) for p in CONFIGS}
    reference = {
        "yolov1_voc.yaml", "yolov2_voc.yaml", "yolov3_voc.yaml",
        "yolov4-tiny_voc.yaml", "yolov4-tiny_lpr.yaml",
        "yolov4-tiny_coco-person.yaml", "yolov4-tiny_focus-front.yaml",
        "yolov4-tiny_focus-rear.yaml",
    }
    assert reference <= ours
