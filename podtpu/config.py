"""YAML experiment-config loading.

Keeps the reference's public config surface (one flat YAML per experiment with
keys like ``model/input_size/num_classes/anchors/optimizer_options/...``;
see /root/reference/utils/yaml_helper.py:9-30 and configs/*.yaml) while adding
TPU-specific optional keys (``max_annots``, ``compute_dtype``, ``mesh``).

Like the reference's loader, scientific-notation literals such as ``1e-3``
must parse as floats, not strings (a PyYAML 1.1 quirk).
"""

from __future__ import annotations

import re
from typing import Any

import yaml

_FLOAT_RESOLVER = re.compile(
    r"""^(?:
     [-+]?(?:[0-9][0-9_]*)\.[0-9_]*(?:[eE][-+]?[0-9]+)?
    |[-+]?(?:[0-9][0-9_]*)(?:[eE][-+]?[0-9]+)
    |\.[0-9_]+(?:[eE][-+][0-9]+)?
    |[-+]?[0-9][0-9_]*(?::[0-5]?[0-9])+\.[0-9_]*
    |[-+]?\.(?:inf|Inf|INF)
    |\.(?:nan|NaN|NAN))$""",
    re.X,
)


class _ConfigLoader(yaml.SafeLoader):
    """SafeLoader with a YAML-1.2-style float resolver (so ``1e-3`` is a float)."""


_ConfigLoader.add_implicit_resolver(
    "tag:yaml.org,2002:float", _FLOAT_RESOLVER, list("-+0123456789.")
)

# Defaults for keys the reference leaves implicit. ``max_annots`` fixes the
# padded annotation count so XLA never recompiles on a new batch (the
# reference pads to the per-batch max instead: utils/yolo_utils.py:28).
DEFAULTS: dict[str, Any] = {
    "max_annots": 64,
    "compute_dtype": "bfloat16",
    "conf_threshold": 0.25,
    "nms_iou_threshold": 0.45,
    "max_detections": 100,
    "top_k_candidates": 512,
    "save_freq": 5,
    "workers": 8,
    "seed": 0,
    "early_stopping_patience": 30,
    "trainer_options": {},
}


def seed_compile_cache(cache_dir: str, seed_path: str | None = None) -> None:
    """Populate ``cache_dir`` from the tracked seed tarball, if present.

    The untracked ``.jax_cache/`` directory is wiped by any workspace reset
    (git clean / fresh clone between build rounds), while the flagship
    batch-128 train-step program costs 456-569 s to compile cold over the
    TPU tunnel — larger than the bench-capture budget (bench.py measured a
    round-4 capture die rc-nonzero mid-compile for exactly this reason).
    ``.jax_cache_seed.tar`` at the repo root is committed to git, so it
    survives every reset; extracting it here makes the first CLI/bench run
    in a fresh checkout hit a warm cache. Only missing entries are written.
    Failures are non-fatal (the cache then just warms the slow way) but
    WARN — a corrupt seed that no-opped silently would resurface later as
    an undiagnosable bench compile-timeout.

    ``seed_path`` (or env ``PODTPU_CACHE_SEED``) overrides the tarball
    location — primarily for tests.
    """
    import os
    import tarfile
    import warnings

    seed = seed_path or os.environ.get("PODTPU_CACHE_SEED") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache_seed.tar",
    )
    if not os.path.isfile(seed):
        return
    try:
        # a process killed mid-extraction (the bench watchdog kills workers)
        # strands its temp files; PIDs recycle, so clear leftovers — but
        # only AGED ones: a concurrent process (multi-process tests share
        # this dir) may be mid-write of its own temp right now, and
        # unlinking it would abort that extraction at os.replace
        import time

        for stale in os.listdir(cache_dir):
            if ".seed." in stale:
                p = os.path.join(cache_dir, stale)
                try:
                    if time.time() - os.path.getmtime(p) > 300:
                        os.unlink(p)
                except OSError:
                    pass
        with tarfile.open(seed, "r") as tf:
            for member in tf.getmembers():
                name = os.path.basename(member.name)
                if not member.isfile() or not name.endswith("-cache"):
                    continue
                dest = os.path.join(cache_dir, name)
                if os.path.exists(dest):
                    continue
                src = tf.extractfile(member)
                if src is None:
                    continue
                # write-then-rename so a concurrent reader (multi-process
                # tests share the repo-local cache dir) never sees a
                # half-written entry
                tmp = dest + f".seed.{os.getpid()}"
                with open(tmp, "wb") as out:
                    out.write(src.read())
                os.replace(tmp, dest)
    except (OSError, tarfile.TarError) as e:
        warnings.warn(f"compile-cache seed {seed} could not be extracted "
                      f"({e!r}); the cache will warm the slow way")


def enable_compile_cache() -> None:
    """Point JAX's persistent compilation cache at a repo-local dir.

    The batch-level train/eval/serving programs compile once ever (per
    platform + fingerprint) instead of per process — bench.py measured the
    flagship train-step compile 568.9 s cold vs 183-293 s warm over the TPU
    tunnel, and the int8+TTA serving artifact ~517 s on this 1-vCPU CPU
    host. Disable with ``PODTPU_COMPILE_CACHE=0``; override the location
    with ``PODTPU_COMPILE_CACHE_DIR``.
    """
    import os

    if os.environ.get("PODTPU_COMPILE_CACHE", "1") == "0":
        return
    cache_dir = os.environ.get("PODTPU_COMPILE_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        seed_compile_cache(cache_dir)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        try:
            jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        except AttributeError:
            pass
    except (OSError, AttributeError):  # read-only checkout / old jax
        pass


def setup_platform(platform: str | None):
    """Pin the JAX backend. The deployment environment may pre-register a
    remote-TPU platform at interpreter start (overriding JAX_PLATFORMS), so
    an explicit ``jax.config`` update is the only reliable override —
    use ``--platform cpu`` on any CLI for local/CI runs."""
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    enable_compile_cache()


def load_yaml_file(file: str) -> dict:
    with open(file, "r") as f:
        return yaml.load(f, Loader=_ConfigLoader)


# Every config key the framework reads, for typo detection: a misspelled
# knob (``emma:`` for ``ema:``) otherwise silently no-ops. Nested entries
# list the option keys of mapping-valued knobs; ``None`` = free-form.
KNOWN_KEYS: dict[str, Any] = {
    # identity / model
    "model": None, "dataset_name": None, "num_classes": None,
    "input_size": None, "in_channels": None, "anchors": None,
    "scaled_anchors": None, "num_boxes": None, "compute_dtype": None,
    "backbone": None,  # reference schema key (informational; the model
    # family implies its backbone)
    "backbone_pretrained": None, "qat": None,
    # data
    "train_list": None, "val_list": None, "names": None,
    "batch_size": None, "max_annots": None, "workers": None,
    "worker_mode": None, "cache_images": None, "uint8_batches": None,
    "mosaic": None, "copy_paste": None, "pixel_ops": None,
    "device_augment": None, "device_geom": None, "device_hsv": None,
    # training
    "epochs": None, "seed": None, "optimizer": None, "scheduler": None,
    "early_stopping_patience": None, "save_dir": None, "save_freq": None,
    "keep_checkpoints": None, "async_checkpoint": None,
    "save_on_signal": None, "log_images": None, "progress": None,
    "steps_per_dispatch": None,
    "remat_backbone": None, "remat_policy": None,
    "rehearsal_decay_step": None,
    "optimizer_options": {"lr", "momentum", "weight_decay", "nesterov",
                          "clip_grad_norm", "accum_steps", "skip_nonfinite",
                          "flat", "decay_policy"},
    "scheduler_options": {"burn_in", "steps", "scales", "milestones",
                          "gamma", "eta_min", "eta_max", "max_cycles",
                          "T_0", "T_mult", "T_up"},
    "trainer_options": {"check_val_every_n_epoch"},
    "swa": {"start_epoch", "bn_recal_batches"},
    "ema": {"decay", "tau", "eval"},
    "parallel_options": {"fsdp", "spatial", "tensor"},
    # eval / deployment
    "conf_threshold": None, "nms_iou_threshold": None,
    "top_k_candidates": None, "max_detections": None,
    "nms_options": {"multi_label", "merge", "agnostic", "classes",
                    "backend"},
    "tta": {"hflip", "scales"},
    "xla_compiler_options": ...,  # free-form flag=value mapping
}


def validate_config(cfg: dict) -> list[str]:
    """Warnings for unknown keys (with a did-you-mean when one is close).

    Unknown keys are warnings, not errors — forward compatibility and
    user-private annotations stay possible (``PODTPU_STRICT_CONFIG=1``
    upgrades them to a failure for CI)."""
    import difflib

    warnings = []

    def check(keys, known, where):
        for k in keys:
            if k in known:
                continue
            hint = difflib.get_close_matches(str(k), [str(x) for x in known],
                                             n=1, cutoff=0.75)
            warnings.append(
                f"unknown config key '{k}'{where}"
                + (f" — did you mean '{hint[0]}'?" if hint else ""))

    check(cfg, KNOWN_KEYS, "")
    for key, sub in KNOWN_KEYS.items():
        if not isinstance(sub, set):
            continue
        val = cfg.get(key)
        if isinstance(val, dict):
            check(val, sub, f" in '{key}'")
    return warnings


def get_configs(file: str, validate: bool = True) -> dict:
    """Load an experiment YAML and fill in framework defaults."""
    import os

    cfg = load_yaml_file(file)
    for key, value in DEFAULTS.items():
        cfg.setdefault(key, value)
    if validate:
        warnings = validate_config(cfg)
        for w in warnings:
            print(f"WARNING: {w} ({file})")
        if warnings and os.environ.get("PODTPU_STRICT_CONFIG"):
            raise ValueError(f"{len(warnings)} unknown config key(s) in "
                             f"{file} (PODTPU_STRICT_CONFIG set)")
    return cfg


def make_model_name(cfg: dict) -> str:
    """'<model>_<dataset>' run name (reference: utils/utility.py:13-14)."""
    return cfg["model"] + "_" + cfg["dataset_name"]


def make_divisible(v: float, divisor: int = 8, min_value: int | None = None) -> int:
    """Round channel counts to a hardware-friendly multiple (utils/utility.py:3-10)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v
