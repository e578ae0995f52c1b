"""Optimizers with the reference's parameter-group decay policy.

The reference has TWO decay policies, one per detector module:

* yolov3_detector.py:49-64 (v3 and v4-tiny recipes) builds three torch
  param groups — BN weights (no decay), conv/linear weights (decay),
  biases (no decay). In a flax param tree that grouping is exactly
  "leaves named ``kernel`` decay; ``scale``/``bias``/BN leaves don't",
  implemented with an ``optax.add_decayed_weights`` mask (coupled decay —
  added to the gradient before momentum, like torch SGD).
* yolov1_detector.py:47-56 and yolov2_detector.py:48-52 pass
  ``self.model.parameters()`` straight to the optimizer — ONE group,
  weight decay on EVERY parameter including BN scales and biases.

``optimizer_options.decay_policy: kernels | all`` selects; the default
follows the model family (v1/v2 → ``all``, everything else → ``kernels``)
so each recipe matches its reference detector bit-for-bit
(tests/test_reference_grad_parity.py locks both in trajectory lockstep).

The generic registry (sgd/adam/radam/adamw — utils/module_select.py:15-24) is
also provided; adamw uses decoupled decay like torch.
"""

from __future__ import annotations

import jax
import jax.flatten_util  # noqa: F401  (ravel_pytree used in the flat path)
import jax.numpy as jnp
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


def decay_policy(cfg: dict) -> str:
    """``kernels`` (v3-style BN/bias-exempt mask) or ``all`` (v1/v2-style
    single-group uniform decay); explicit ``optimizer_options.decay_policy``
    wins, else the model family's reference detector decides."""
    opts = dict(cfg.get("optimizer_options", {}))
    policy = opts.get("decay_policy")
    if policy is None:
        policy = "all" if cfg.get("model") in ("yolov1", "yolov2") else "kernels"
    if policy not in ("kernels", "all"):
        raise ValueError(f"unknown decay_policy '{policy}' "
                         "(expected kernels | all)")
    return policy


def _add_flat_decayed_weights(weight_decay: float, coeff_vec) -> optax.GradientTransformation:
    """Coupled weight decay on a flattened parameter vector with per-element
    coefficients (``g += wd * coeff * p``) — the flat-space equivalent of
    ``optax.add_decayed_weights(wd, mask)``; used inside ``optax.flatten``
    where per-leaf masks can't be expressed."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("flat weight decay requires params")
        updates = jax.tree_util.tree_map(
            lambda g, p: g + weight_decay * coeff_vec * p, updates, params)
        return updates, state

    return optax.GradientTransformation(init, update)


def build_optimizer(cfg: dict, params) -> optax.GradientTransformation:
    """Config -> optax transformation with the LR schedule baked in.

    ``optimizer_options.accum_steps: k`` wraps the whole chain in
    ``optax.MultiSteps``: gradients average over k micro-batches and the
    inner update (momentum, schedule step) fires every k-th call — an
    effective batch of ``k * batch_size`` when HBM caps the physical batch.
    Mean-loss gradients make the k-average exactly the big-batch gradient.
    (BatchNorm still sees per-micro-batch statistics, the same deviation
    any gradient-accumulation scheme has; the Trainer logs
    ``schedule(step // k)`` so the reported lr matches the schedule the
    optimizer actually applies.)
    """
    tx = _build_optimizer(cfg, params)
    accum = accum_steps(cfg)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    skip = int(dict(cfg.get("optimizer_options", {}))
               .get("skip_nonfinite", 0) or 0)
    if skip > 0:
        # failure detection without a host sync: a non-finite update (loss
        # spike/overflow, e.g. the exp(wh) path) is dropped on device and
        # counted; after `skip` consecutive bad steps the update applies
        # anyway so the NaN surfaces instead of training silently stalling.
        # The Trainer logs the running count (`skipped_nonfinite_updates`).
        tx = optax.apply_if_finite(tx, max_consecutive_errors=skip)
    return tx


def total_notfinite(opt_state) -> int | None:
    """Running count of dropped non-finite updates, or None when the
    ``optimizer_options.skip_nonfinite`` guard is not active."""
    if isinstance(opt_state, optax.ApplyIfFiniteState):
        return int(jax.device_get(opt_state.total_notfinite))
    return None


def accum_steps(cfg: dict) -> int:
    """``optimizer_options.accum_steps`` (1 = no accumulation). Single
    source of truth for build_optimizer and the Trainer's lr logging."""
    return int(dict(cfg.get("optimizer_options", {})).get("accum_steps", 1)
               or 1)


def _build_optimizer(cfg: dict, params) -> optax.GradientTransformation:
    opts = dict(cfg.get("optimizer_options", {}))
    name = cfg.get("optimizer", "sgd")
    schedule = build_schedule(cfg)
    weight_decay = float(opts.get("weight_decay", 0.0))
    # mask=None decays every leaf — torch's single-group SGD(parameters())
    mask = (kernel_decay_mask(params) if decay_policy(cfg) == "kernels"
            else None)

    clip_norm = opts.get("clip_grad_norm")  # stability knob (default off)

    def with_clip(*transforms):
        chain = ([optax.clip_by_global_norm(float(clip_norm))]
                 if clip_norm else [])
        return optax.chain(*chain, *transforms)

    if name == "sgd":
        momentum = float(opts.get("momentum", 0.0))
        nesterov = bool(opts.get("nesterov", False))
        if bool(opts.get("flat", False)):
            # Run the whole update on ONE flattened parameter vector
            # (optax.flatten). Measured on v5e (batch-128 step): the xprof
            # trace shows the per-leaf chain as ~300 tiny multiply_add
            # fusions (~29 ms of op time), but they hide under async VMEM
            # copy waits — flattening removes them yet the step gets ~2%
            # SLOWER (918 vs 935 img/s) from the ravel/unravel concats, so
            # this stays opt-in. Numerics are identical per element; the
            # opt_state layout changes (momentum is one 1-D vector).
            chain = []
            if weight_decay:
                # per-element decay coefficients in ravel order (the masked
                # add_decayed_weights equivalent: kernels 1, bn/bias 0;
                # policy 'all' = every coefficient 1)
                coeff = jax.tree_util.tree_map(
                    lambda p, m: jnp.full(p.shape, 1.0 if m else 0.0,
                                          p.dtype),
                    params, mask if mask is not None
                    else jax.tree_util.tree_map(lambda _: True, params))
                coeff_vec = jax.flatten_util.ravel_pytree(coeff)[0]
                chain.append(_add_flat_decayed_weights(weight_decay,
                                                       coeff_vec))
            chain.append(optax.sgd(schedule, momentum=momentum or None,
                                   nesterov=nesterov))
            return optax.flatten(with_clip(*chain))
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
