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


def test_validate_config_flags_typos_with_suggestions():
    from podtpu.config import validate_config

    warnings = validate_config({
        "model": "yolov3", "emma": True,                   # ema typo
        "optimizer_options": {"lr": 1e-3, "momentun": 0.9},  # momentum typo
        "nms_options": {"multilabel": True},               # multi_label typo
        "x_custom_note": "mine",                           # unknown, no hint
    })
    text = "\n".join(warnings)
    assert "emma" in text and "'ema'" in text
    assert "momentun" in text and "'momentum'" in text
    assert "multilabel" in text and "'multi_label'" in text
    assert "x_custom_note" in text
    assert len(warnings) == 4


def test_validate_config_accepts_all_shipped_configs():
    """Every config in configs/ passes validation clean — the registry and
    the shipped surface stay in sync."""
    import glob

    from podtpu.config import get_configs, validate_config

    for path in glob.glob("configs/*.yaml"):
        cfg = get_configs(path, validate=False)
        assert validate_config(cfg) == [], path


def test_strict_config_env(tmp_path, monkeypatch):
    import pytest as _pytest

    from podtpu.config import get_configs

    p = tmp_path / "bad.yaml"
    p.write_text("model: yolov3\nemma: true\n")
    monkeypatch.setenv("PODTPU_STRICT_CONFIG", "1")
    with _pytest.raises(ValueError, match="unknown config key"):
        get_configs(str(p))
    monkeypatch.delenv("PODTPU_STRICT_CONFIG")
    get_configs(str(p))  # warning only


def test_seed_compile_cache(tmp_path, monkeypatch):
    """The tracked seed tarball restores a wiped .jax_cache/ — missing
    entries extracted, existing entries never clobbered, non-cache and
    path-traversal member names neutralized (flattened to basename)."""
    import io
    import os
    import tarfile

    from podtpu.config import seed_compile_cache

    seed = tmp_path / ".jax_cache_seed.tar"

    def add(tf, name, payload):
        data = payload.encode()
        info = tarfile.TarInfo(name)
        info.size = len(data)
        tf.addfile(info, io.BytesIO(data))

    with tarfile.open(seed, "w") as tf:
        add(tf, "./jit_train_step-aaaa-cache", "seeded")
        add(tf, "./jit_init_fn-bbbb-cache", "seeded")
        add(tf, "../jit_evil-cccc-cache", "traversal")
        add(tf, "./notes.txt", "not a cache entry")

    cache_dir = tmp_path / "cache"
    cache_dir.mkdir()
    (cache_dir / "jit_init_fn-bbbb-cache").write_text("preexisting")

    # an AGED temp file from a previously killed extraction must be
    # cleaned; a FRESH one (a concurrent process mid-write) must survive
    import time

    (cache_dir / "jit_x-cache.seed.12345").write_text("stale temp")
    os.utime(cache_dir / "jit_x-cache.seed.12345",
             (time.time() - 600, time.time() - 600))
    (cache_dir / "jit_y-cache.seed.67890").write_text("in-flight temp")

    seed_compile_cache(str(cache_dir), seed_path=str(seed))

    assert (cache_dir / "jit_train_step-aaaa-cache").read_text() == "seeded"
    # existing entries are never overwritten
    assert (cache_dir / "jit_init_fn-bbbb-cache").read_text() == "preexisting"
    # traversal name flattened inside the cache dir, nothing escapes it
    assert (cache_dir / "jit_evil-cccc-cache").read_text() == "traversal"
    assert not (tmp_path / "jit_evil-cccc-cache").exists()
    assert not (cache_dir / "notes.txt").exists()
    # the extractor's own temps and the AGED leftover are gone; the fresh
    # (concurrent) temp survives untouched
    assert [p.name for p in cache_dir.glob("*.seed.*")] == [
        "jit_y-cache.seed.67890"]


def test_seed_compile_cache_env_override_and_corrupt_warns(tmp_path, monkeypatch):
    """PODTPU_CACHE_SEED relocates the tarball; a corrupt seed warns
    instead of no-opping silently (it would otherwise resurface later as an
    undiagnosable bench compile-timeout)."""
    import warnings

    from podtpu.config import seed_compile_cache

    bad = tmp_path / "corrupt.tar"
    bad.write_bytes(b"this is not a tarball")
    cache_dir = tmp_path / "cache"
    cache_dir.mkdir()
    monkeypatch.setenv("PODTPU_CACHE_SEED", str(bad))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        seed_compile_cache(str(cache_dir))
    assert any("could not be extracted" in str(w.message) for w in caught)
