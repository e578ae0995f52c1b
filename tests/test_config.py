"""Config loader tests (utils/yaml_helper.py + utility.py roles)."""

import pytest

from podtpu.config import get_configs, make_divisible, make_model_name


def test_scientific_notation_parses_as_float(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "model: yolov3\ndataset_name: voc\n"
        "optimizer_options:\n  lr: 1e-3\n  weight_decay: 5e-3\n"
    )
    cfg = get_configs(str(p))
    assert isinstance(cfg["optimizer_options"]["lr"], float)
    assert cfg["optimizer_options"]["lr"] == pytest.approx(1e-3)


def test_defaults_fill_without_clobbering(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("model: yolov2\nmax_annots: 7\n")
    cfg = get_configs(str(p))
    assert cfg["max_annots"] == 7           # explicit wins
    assert cfg["conf_threshold"] == 0.25    # default fills
    assert cfg["compute_dtype"] == "bfloat16"


def test_make_model_name():
    assert make_model_name({"model": "yolov3", "dataset_name": "voc"}) == \
        "yolov3_voc"


def test_make_divisible():
    assert make_divisible(16) == 16
    assert make_divisible(13) == 16
    assert make_divisible(100, 8) == 104 or make_divisible(100, 8) % 8 == 0
