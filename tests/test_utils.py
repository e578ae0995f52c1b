"""Utility tests: auto-anchor (kmeans + GA), viz, summary, profiling."""

import numpy as np
import pytest

from podtpu.utils.anchors import (
    anchor_fitness,
    best_possible_recall,
    evolve_anchors,
    kmeans_anchors,
    ratio_metric,
)
from podtpu.utils.summary import summarize
from podtpu.utils.viz import annots_to_boxes, draw_boxes


def test_ratio_metric_perfect():
    wh = np.array([[10.0, 20.0]])
    anchors = np.array([[10.0, 20.0], [5.0, 5.0]])
    m = ratio_metric(wh, anchors)
    assert m[0, 0] == pytest.approx(1.0)
    assert m[0, 1] < 0.5


def test_bpr_and_kmeans_and_ga():
    rng = np.random.default_rng(0)
    # three natural clusters of box sizes
    wh = np.concatenate([
        rng.normal((20, 20), 2, (200, 2)),
        rng.normal((60, 40), 4, (200, 2)),
        rng.normal((120, 120), 8, (200, 2)),
    ]).clip(2)
    anchors = kmeans_anchors(wh, 3, seed=0)
    assert anchors.shape == (3, 2)
    bpr = best_possible_recall(wh, anchors)
    assert bpr > 0.98
    # GA must not make fitness worse
    fit0 = anchor_fitness(wh, anchors)
    evolved = evolve_anchors(wh, anchors, generations=50, seed=0)
    assert anchor_fitness(wh, evolved) >= fit0
    # sorted by area
    areas = evolved.prod(axis=1)
    assert (np.diff(areas) >= 0).all()


def test_draw_boxes_and_annots():
    img = np.zeros((100, 100, 3), np.uint8)
    boxes = [[50, 50, 20, 20, 0.9, 0]]
    out = draw_boxes(img.copy(), boxes, ["thing"])
    assert out.sum() > 0  # something was drawn

    annots = -np.ones((4, 5), np.float32)
    annots[0] = [0.5, 0.5, 0.2, 0.2, 1]
    rows = annots_to_boxes(annots, 100)
    assert rows.shape == (1, 6)
    np.testing.assert_allclose(rows[0], [50, 50, 20, 20, 1, 1])


def test_summary_totals():
    import jax

    from podtpu.models import YoloV4Tiny

    model = YoloV4Tiny(num_classes=3)
    variables = model.init(
        jax.random.PRNGKey(0), jax.numpy.zeros((1, 64, 64, 3)), train=False
    )
    text = summarize(variables["params"], variables["batch_stats"])
    assert "Total trainable params" in text
    total = sum(p.size for p in jax.tree_util.tree_leaves(variables["params"]))
    assert f"{total:,}" in text


def test_profile_and_steptimer():
    import time

    from podtpu.utils.profiling import Profile, StepTimer, init_seeds

    with Profile(sync=False) as p:
        time.sleep(0.01)
    assert p.dt >= 0.01

    t = StepTimer()
    t.tick()
    time.sleep(0.005)
    t.tick()
    assert t.steps_per_sec() > 0
    assert t.images_per_sec(4) == pytest.approx(4 * t.steps_per_sec())

    key = init_seeds(7)
    assert key is not None


def test_timeout_context():
    import time

    from podtpu.utils.profiling import Timeout

    with Timeout(5.0):
        time.sleep(0.01)  # completes fine

    import pytest as _pytest

    with _pytest.raises(TimeoutError):
        with Timeout(0.05):
            time.sleep(0.5)

    with Timeout(0.05, suppress=True):
        time.sleep(0.5)  # suppressed


def test_logger_and_colorstr():
    from podtpu.utils.log import colorstr, get_logger

    s = colorstr("hello")
    assert "hello" in s and s.endswith("\033[0m")
    logger = get_logger("podtpu-test")
    logger.info("info line")  # should not raise
    assert logger.level in (20, 30)
