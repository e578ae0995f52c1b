"""LR schedules as pure ``step -> lr`` functions (optax-style).

jnp re-designs of the reference's schedulers (module/lr_scheduler.py):

* ``yolo_lr``      — darknet burn-in ``lr*(step/burn_in)^4`` then step decays
                     at ``steps`` by cumulative ``scales``
                     (lr_scheduler.py:66-92; the active VOC recipe uses
                     burn_in=1000, steps=[40000], scales=[0.1]);
* ``cosine_annealing_warm_up_restarts`` — linear warmup to eta_max, cosine
                     decay back to base, cycle length x T_mult, amplitude
                     x gamma per cycle (lr_scheduler.py:10-63);
* ``multi_step``    — torch MultiStepLR;
* ``cosine_annealing_warm_restarts`` — torch CosineAnnealingWarmRestarts.

All schedules are stepped per optimizer step, matching the reference's
Lightning ``interval: "step"`` wiring (module/yolov3_detector.py:79-85).
Everything is branchless jnp so the schedule can live inside the jitted
update.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def yolo_lr(base_lr: float, burn_in: int, steps: Sequence[int],
            scales: Sequence[float]) -> Schedule:
    steps_arr = jnp.asarray(steps, dtype=jnp.float32)
    scales_arr = jnp.asarray(scales, dtype=jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = base_lr * (step / burn_in) ** 4
        factor = jnp.prod(jnp.where(step >= steps_arr, scales_arr, 1.0))
        return jnp.where(step < burn_in, warm, base_lr * factor)

    return schedule


def multi_step(base_lr: float, milestones: Sequence[int], gamma: float = 0.1
               ) -> Schedule:
    ms = jnp.asarray(milestones, dtype=jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        n = jnp.sum(step >= ms)
        return base_lr * gamma**n

    return schedule


def cosine_annealing_warm_restarts(base_lr: float, T_0: int, T_mult: int = 1,
                                   eta_min: float = 0.0) -> Schedule:
    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        if T_mult == 1:
            t_cur = jnp.mod(step, T_0)
            t_i = jnp.asarray(T_0, jnp.float32)
        else:
            n = jnp.floor(
                jnp.log(step / T_0 * (T_mult - 1) + 1.0) / math.log(T_mult)
            )
            t_cur = step - T_0 * (T_mult**n - 1.0) / (T_mult - 1)
            t_i = T_0 * T_mult**n
        return eta_min + (base_lr - eta_min) * (1 + jnp.cos(jnp.pi * t_cur / t_i)) / 2

    return schedule


def cosine_annealing_warm_up_restarts(
    base_lr: float,
    T_0: int,
    T_mult: int = 1,
    eta_max: float = 0.1,
    T_up: int = 0,
    gamma: float = 1.0,
    max_cycles: int = 40,
) -> Schedule:
    """Warmup-to-eta_max cosine restarts (lr_scheduler.py:10-63 semantics).

    Matches the reference's ITERATIVE ``step()`` recurrence — the one
    Lightning actually drives — where each new cycle has length
    ``T_i' = (T_i - T_up) * T_mult + T_up`` (lr_scheduler.py:42-45), NOT the
    ``T_0 * T_mult**n`` closed form its epoch-jump branch uses; value-locked
    against the torch class in tests. Cycle starts are precomputed (static
    hyperparameters), so the schedule stays branchless jnp.
    """
    lengths = []
    t_i = float(T_0)
    for _ in range(max_cycles):
        lengths.append(t_i)
        t_i = (t_i - T_up) * T_mult + T_up
    starts = [0.0]
    for ln in lengths[:-1]:
        starts.append(starts[-1] + ln)
    starts_arr = jnp.asarray(starts, jnp.float32)      # [max_cycles]
    lengths_arr = jnp.asarray(lengths, jnp.float32)    # [max_cycles]

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        cycle = jnp.sum(step >= starts_arr) - 1
        cycle = jnp.clip(cycle, 0, max_cycles - 1)
        t_cur = step - starts_arr[cycle]
        t_i = lengths_arr[cycle]
        eta = eta_max * gamma**cycle.astype(jnp.float32)
        warm = (eta - base_lr) * t_cur / jnp.maximum(T_up, 1) + base_lr
        cos = base_lr + (eta - base_lr) * (
            1 + jnp.cos(jnp.pi * (t_cur - T_up) / (t_i - T_up))
        ) / 2
        return jnp.where(t_cur < T_up, warm, cos)

    return schedule


def constant(base_lr: float) -> Schedule:
    return lambda step: jnp.asarray(base_lr, jnp.float32)


def build_schedule(cfg: dict) -> Schedule:
    """Config -> schedule (utils/module_select.py:26-36 registry analog)."""
    base_lr = float(cfg["optimizer_options"]["lr"])
    name = cfg.get("scheduler")
    opts = cfg.get("scheduler_options", {}) or {}
    if name is None:
        return constant(base_lr)
    if name == "yolo_lr":
        return yolo_lr(base_lr, opts["burn_in"], opts["steps"], opts["scales"])
    if name == "multi_step":
        return multi_step(base_lr, opts["milestones"], opts.get("gamma", 0.1))
    if name == "cosine_annealing_warm_restarts":
        return cosine_annealing_warm_restarts(
            base_lr, opts["T_0"], opts.get("T_mult", 1), opts.get("eta_min", 0.0)
        )
    if name == "cosine_annealing_warm_up_restarts":
        return cosine_annealing_warm_up_restarts(
            base_lr,
            opts["T_0"],
            opts.get("T_mult", 1),
            opts.get("eta_max", 0.1),
            opts.get("T_up", 0),
            opts.get("gamma", 1.0),
            # precomputed-cycle budget: with T_mult=1, runs past
            # max_cycles*T_0 steps clamp to the last cycle and stop
            # restarting — raise this for very long runs
            opts.get("max_cycles", 40),
        )
    raise ValueError(f"unknown scheduler '{name}'")
