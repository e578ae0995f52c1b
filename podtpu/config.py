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


def setup_platform(platform: str | None):
    """Pin the JAX backend. The deployment environment may pre-register a
    remote-TPU platform at interpreter start (overriding JAX_PLATFORMS), so
    an explicit ``jax.config`` update is the only reliable override —
    use ``--platform cpu`` on any CLI for local/CI runs."""
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def load_yaml_file(file: str) -> dict:
    with open(file, "r") as f:
        return yaml.load(f, Loader=_ConfigLoader)


def get_configs(file: str) -> dict:
    """Load an experiment YAML and fill in framework defaults."""
    cfg = load_yaml_file(file)
    for key, value in DEFAULTS.items():
        cfg.setdefault(key, value)
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
