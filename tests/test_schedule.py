"""LR schedule values vs the reference formulas (module/lr_scheduler.py)."""

import numpy as np
import pytest

from podtpu.train.schedule import (
    build_schedule,
    cosine_annealing_warm_up_restarts,
    multi_step,
    yolo_lr,
)


def test_yolo_lr_burn_in_and_decay():
    s = yolo_lr(1e-3, burn_in=1000, steps=[40000], scales=[0.1])
    assert float(s(0)) == 0.0
    # lr * (step/burn_in)^4
    assert float(s(500)) == pytest.approx(1e-3 * 0.5**4, rel=1e-6)
    assert float(s(1000)) == pytest.approx(1e-3, rel=1e-6)
    assert float(s(39999)) == pytest.approx(1e-3, rel=1e-6)
    assert float(s(40000)) == pytest.approx(1e-4, rel=1e-6)
    assert float(s(80000)) == pytest.approx(1e-4, rel=1e-6)


def test_yolo_lr_multiple_steps_compound():
    s = yolo_lr(1.0, burn_in=10, steps=[100, 200], scales=[0.1, 0.5])
    assert float(s(150)) == pytest.approx(0.1, rel=1e-6)
    assert float(s(250)) == pytest.approx(0.05, rel=1e-6)


def test_multi_step():
    s = multi_step(1.0, milestones=[5, 10], gamma=0.1)
    assert float(s(4)) == pytest.approx(1.0)
    assert float(s(5)) == pytest.approx(0.1)
    assert float(s(10)) == pytest.approx(0.01, rel=1e-6)


def test_cosine_warmup_restarts_shape():
    s = cosine_annealing_warm_up_restarts(
        1e-5, T_0=100, T_mult=2, eta_max=1e-3, T_up=20, gamma=0.5
    )
    # warmup is linear from base to eta_max
    assert float(s(0)) == pytest.approx(1e-5, rel=1e-5)
    assert float(s(20)) == pytest.approx(1e-3, rel=1e-3)
    # end of first cycle decays back to ~base
    assert float(s(99)) < 2e-5
    # second cycle amplitude halves
    vals = [float(s(t)) for t in range(100, 300)]
    assert max(vals) == pytest.approx(5e-4, rel=0.05)


def test_build_schedule_from_cfg():
    cfg = {
        "optimizer_options": {"lr": 1e-3},
        "scheduler": "yolo_lr",
        "scheduler_options": {"burn_in": 1000, "steps": [40000], "scales": [0.1]},
    }
    s = build_schedule(cfg)
    assert float(s(1000)) == pytest.approx(1e-3, rel=1e-6)

    cfg_none = {"optimizer_options": {"lr": 5e-4}}
    s2 = build_schedule(cfg_none)
    assert float(s2(123)) == pytest.approx(5e-4)


def test_unknown_scheduler_raises():
    with pytest.raises(ValueError):
        build_schedule({"optimizer_options": {"lr": 1.0}, "scheduler": "bogus"})


def test_cosine_warmup_reference_goldens():
    """Values from the reference CosineAnnealingWarmUpRestarts run under
    torch (module/lr_scheduler.py:10-63); step k == scheduler state after
    construction + k steps."""
    from podtpu.train.schedule import cosine_annealing_warm_up_restarts

    s = cosine_annealing_warm_up_restarts(
        1e-5, T_0=100, T_mult=2, eta_max=1e-3, T_up=20, gamma=0.5
    )
    goldens = {
        0: 1e-05, 10: 0.000505, 20: 0.001, 60: 0.000505,
        99: 1.0381627060842164e-05, 100: 1e-05, 120: 0.0005,
        250: 5.128994498587647e-05, 350: 0.0002358305517218026,
    }
    for step, want in goldens.items():
        assert float(s(step)) == pytest.approx(want, rel=1e-4), step


def test_yolo_lr_reference_goldens():
    from podtpu.train.schedule import yolo_lr

    s = yolo_lr(1e-3, burn_in=100, steps=[300, 400], scales=[0.1, 0.5])
    goldens = {0: 0.0, 50: 6.25e-05, 100: 0.001, 299: 0.001, 300: 0.0001,
               399: 0.0001, 400: 5e-05, 450: 5e-05}
    for step, want in goldens.items():
        assert float(s(step)) == pytest.approx(want, rel=1e-5, abs=1e-12), step
