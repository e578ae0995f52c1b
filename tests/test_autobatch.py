"""Auto-batch sizing tool (tools/autobatch.py): XLA AOT memory planning in
place of the CUDA-world allocate-until-OOM probe. Nothing executes — the
analysis comes from ``compiled.memory_analysis()`` on shape skeletons."""

import sys

import pytest

sys.path.insert(0, "tools")

from autobatch import plan_memory, recommend  # noqa: E402

from test_train import TINY_CFG  # noqa: E402


def test_recommend_picks_largest_fitting():
    rows = [{"batch": 8, "peak": 10}, {"batch": 16, "peak": 19},
            {"batch": 32, "peak": 40}]
    assert recommend(rows, limit_bytes=22, frac=1.0) == 16
    assert recommend(rows, limit_bytes=100, frac=1.0) == 32
    assert recommend(rows, limit_bytes=22, frac=0.5) == 8  # 10 <= 11
    assert recommend(rows, limit_bytes=18, frac=0.5) is None


@pytest.mark.slow
def test_plan_memory_scales_with_batch():
    """Planned temp/activation bytes grow with batch; arguments (the train
    state + the batch) barely move — activations dominate the scaling."""
    small = plan_memory(dict(TINY_CFG), 2)
    big = plan_memory(dict(TINY_CFG), 8)
    assert small["peak"] > 0 and big["peak"] > small["peak"]
    assert big["temp"] > small["temp"]
    # the state's bytes are batch-independent; args grow only by the batch
    # leaves (uint8 images by default + float annots)
    per_sample = 64 * 64 * 3 * 1 + 8 * 5 * 4
    assert big["arguments"] - small["arguments"] == 6 * per_sample


@pytest.mark.slow
def test_plan_memory_respects_config_batch_leaves():
    """uint8_batches shrinks the image argument 4x; device_geom adds the
    [B,4] geom leaf without breaking the lowering."""
    f32 = plan_memory({**TINY_CFG, "uint8_batches": False}, 4)
    u8 = plan_memory({**TINY_CFG, "uint8_batches": True}, 4)
    assert f32["arguments"] - u8["arguments"] == 4 * 64 * 64 * 3 * 3
