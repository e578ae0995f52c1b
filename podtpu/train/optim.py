"""Optimizers with the reference's parameter-group decay policy.

The active v3 recipe builds three torch param groups — BN weights (no decay),
conv/linear weights (decay), biases (no decay) — on nesterov SGD
(module/yolov3_detector.py:49-64). In a flax param tree that grouping is
exactly "leaves named ``kernel`` decay; ``scale``/``bias``/BN leaves don't",
implemented with an ``optax.add_decayed_weights`` mask (coupled decay — added
to the gradient before momentum, like torch SGD).

The generic registry (sgd/adam/radam/adamw — utils/module_select.py:15-24) is
also provided; adamw uses decoupled decay like torch.
"""

from __future__ import annotations

import jax
import optax

from podtpu.train.schedule import build_schedule


def kernel_decay_mask(params) -> object:
    """True for leaves that should receive weight decay (conv/linear kernels)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = [p for p, _ in flat]

    def is_kernel(path):
        last = path[-1]
        key = getattr(last, "key", getattr(last, "name", str(last)))
        return key == "kernel"

    mask_flat = [is_kernel(p) for p in paths]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, mask_flat)


def build_optimizer(cfg: dict, params) -> optax.GradientTransformation:
    """Config -> optax transformation with the LR schedule baked in."""
    opts = dict(cfg.get("optimizer_options", {}))
    name = cfg.get("optimizer", "sgd")
    schedule = build_schedule(cfg)
    weight_decay = float(opts.get("weight_decay", 0.0))
    mask = kernel_decay_mask(params)

    clip_norm = opts.get("clip_grad_norm")  # stability knob (default off)

    def with_clip(*transforms):
        chain = ([optax.clip_by_global_norm(float(clip_norm))]
                 if clip_norm else [])
        return optax.chain(*chain, *transforms)

    if name == "sgd":
        momentum = float(opts.get("momentum", 0.0))
        nesterov = bool(opts.get("nesterov", False))
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay, mask=mask))
        chain.append(
            optax.sgd(schedule, momentum=momentum or None, nesterov=nesterov)
        )
        return with_clip(*chain)
    if name == "adam":
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay, mask=mask))
        chain.append(optax.adam(schedule))
        return with_clip(*chain)
    if name == "radam":
        chain = []
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay, mask=mask))
        chain.append(optax.radam(schedule))
        return with_clip(*chain)
    if name == "adamw":
        return with_clip(
            optax.adamw(schedule, weight_decay=weight_decay, mask=mask)
        )
    raise ValueError(f"unknown optimizer '{name}'")
