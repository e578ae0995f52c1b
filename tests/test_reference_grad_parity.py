"""Live GRADIENT and OPTIMIZER-STEP parity against the actual reference.

tests/test_reference_parity.py locks forward outputs and loss scalars;
these tests lock the two remaining pieces of the training recurrence:

* d(loss)/d(params) — torch autograd through the reference's real model +
  active loss vs jax.grad through podtpu's, on ported weights and the same
  batch (train-mode BatchNorm on both sides);
* the SGD update itself — the reference's 3-param-group nesterov SGD
  (module/yolov3_detector.py:52-64: BN weights no decay, conv weights
  decay, biases no decay) vs podtpu's optax chain
  (podtpu/train/optim.py::build_optimizer with the kernel-only decay
  mask), fed identical gradients for several steps so the momentum buffer
  and weight-decay order are both exercised.

Same loss surface + same update rule + same schedule (value-tested in
tests/test_schedule.py) = the training trajectories can only diverge
through data/augmentation draws — the strongest recipe-parity proxy
available without the VOC dataset.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from podtpu.export.torch_port import (  # noqa: E402
    import_reference,
    podtpu_to_torch,
    torch_to_podtpu,
)
from podtpu.losses import yolov1_loss, yolov2_loss_v2, yolov3_loss_v2  # noqa: E402
from podtpu.models.yolov1 import YoloV1  # noqa: E402
from podtpu.models.yolov2 import YoloV2  # noqa: E402
from podtpu.models.yolov3 import YoloV3  # noqa: E402
from podtpu.models.yolov4_tiny import YoloV4Tiny  # noqa: E402
from tests.helpers import (  # noqa: E402
    VOC_ANCHORS,
    VOC_SCALED_ANCHORS,
    make_targets,
    nchw_to_nhwc,
    normal,
)

pytestmark = pytest.mark.slow

C = 20
B, T, S = 2, 8, 128
# yolov1's flatten->linear head hard-codes the 448 deployment resolution
# (models/detector/yolov1.py:38: Linear(256*7*7, ...))
_SIZE = {"yolov1": 448, "yolov2": S, "yolov3": S, "yolov4-tiny": S}


def _build_reference(name: str):
    torch.manual_seed(7)
    dk = import_reference("models.backbone.darknet")
    if name == "yolov1":
        det = import_reference("models.detector.yolov1")
        bb = dk.darknet19(pretrained="", features_only=True)
        return det.YoloV1(bb, num_classes=C, num_boxes=2)
    if name == "yolov2":
        det = import_reference("models.detector.yolov2")
        bb = dk.darknet19(pretrained="", features_only=True, out_indices=[4, 5])
        return det.YoloV2(bb, num_classes=C, num_anchors=5)
    if name == "yolov3":
        det = import_reference("models.detector.yolov3")
        bb = dk.darknet19(pretrained="", features_only=True,
                          out_indices=[3, 4, 5])
        return det.YoloV3(bb, num_classes=C, num_anchors=9)
    det = import_reference("models.detector.yolov4_tiny")
    return det.YoloV4TinyV4(num_classes=C, num_anchors=9)


def _train_mode_no_dropout(ref) -> None:
    """train() for BN, but Dropout modules to eval — the jax side disables
    dropout via ``YoloV1(dropout_rate=0.0)`` (stochastic draws can never
    match across frameworks; BN train-mode statistics are the parity
    surface here)."""
    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.eval()


def _build_torch_optimizer(ref, name: str, lr, momentum, wd):
    """The reference's EXACT per-detector optimizer construction:
    yolov1/yolov2 pass ``model.parameters()`` as ONE group (decay on every
    parameter — yolov1_detector.py:47-56, yolov2_detector.py:48-52); the
    v3 module splits BN-weight/kernel/bias groups with kernel-only decay
    (yolov3_detector.py:52-64, also used by the v4-tiny recipe)."""
    import torch.nn as nn

    g0, g1, g2 = [], [], []
    for v in ref.modules():
        if hasattr(v, "bias") and isinstance(v.bias, nn.Parameter):
            g2.append(v.bias)
        if isinstance(v, nn.BatchNorm2d):
            g0.append(v.weight)
        elif hasattr(v, "weight") and isinstance(v.weight, nn.Parameter):
            g1.append(v.weight)
    id2name = {id(p): k for k, p in ref.named_parameters()}
    kernel_keys = {id2name[id(p)] for p in g1}
    if name in ("yolov1", "yolov2"):
        optim = torch.optim.SGD(ref.parameters(), lr=lr, momentum=momentum,
                                nesterov=True, weight_decay=wd)
    else:
        optim = torch.optim.SGD(g0, lr=lr, momentum=momentum, nesterov=True)
        optim.add_param_group({"params": g1, "weight_decay": wd})
        optim.add_param_group({"params": g2})
    return optim, kernel_keys


def _grad_err_table(t_grads: dict, j_torch_layout: dict):
    """{torch key: relative max error} over every parameter gradient."""
    errs = {}
    for k, tg in t_grads.items():
        a = tg.detach().numpy()
        b = np.asarray(j_torch_layout[k])
        assert a.shape == b.shape, k
        scale = max(float(np.abs(a).max()), 1e-6)
        errs[k] = float(np.abs(a - b).max()) / scale
    return errs


def _grad_direction_table(t_grads: dict, j_torch_layout: dict):
    """{torch key: (cosine, |norm ratio - 1|)} per parameter gradient."""
    out = {}
    for k, tg in t_grads.items():
        a = tg.detach().numpy().astype(np.float64).ravel()
        b = np.asarray(j_torch_layout[k], np.float64).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        out[k] = (float(a @ b / (na * nb + 1e-30)),
                  abs(na / max(nb, 1e-30) - 1.0))
    return out


# Criteria per model: yolov4-tiny's shallow graph is numerically benign and
# holds elementwise parity; darknet19-based yolov2 is 19 layers deep with
# 1024-channel/4x4-spatial batch stats, where f32 round-off alone moves
# individual gradient elements by ~1e-2 — measured: an f64 rerun of the SAME
# jax graph differs from its own f32 result by up to 2e-1 on the same
# tensors where torch-f32 disagrees, i.e. the discrepancy is conditioning,
# not semantics. There, parity is asserted as direction (cosine) + norm.
# yolov1 adds a flatten->linear head on the same deep backbone: direction.
_GRAD_CRITERIA = {"yolov4-tiny": ("elementwise", 2e-3),
                  "yolov1": ("direction", (0.999, 0.02)),
                  "yolov2": ("direction", (0.999, 0.02)),
                  "yolov3": ("direction", (0.999, 0.02))}


def _podtpu_model(name: str):
    return {"yolov1": lambda: YoloV1(num_classes=C, num_boxes=2,
                                     dropout_rate=0.0),
            "yolov2": lambda: YoloV2(num_classes=C, num_anchors=5),
            "yolov3": lambda: YoloV3(num_classes=C, num_anchors=9),
            "yolov4-tiny": lambda: YoloV4Tiny(num_classes=C,
                                              num_anchors=9)}[name]()


def _torch_loss_fn(name: str, size: int):
    if name == "yolov1":
        loss_mod = import_reference("models.loss.yolov1_loss")
        return loss_mod.YoloV1Loss(C, 2)
    if name == "yolov2":
        loss_mod = import_reference("models.loss.yolov2_loss")
        return loss_mod.YoloV2LossV2(C, VOC_SCALED_ANCHORS)
    loss_mod = import_reference("models.loss.yolov3_loss")
    return loss_mod.YoloV3LossV2(C, VOC_ANCHORS, size)


def _jax_loss_fn(name: str, size: int):
    if name == "yolov1":
        return lambda preds, tgt: yolov1_loss(preds, tgt, C, 2)
    if name == "yolov2":
        return lambda preds, tgt: yolov2_loss_v2(preds, tgt, C,
                                                 VOC_SCALED_ANCHORS)
    return lambda preds, tgt: yolov3_loss_v2(preds, tgt, C, VOC_ANCHORS, size)


@pytest.mark.parametrize("name", ["yolov1", "yolov2", "yolov3", "yolov4-tiny"])
def test_gradient_parity(name):
    size = _SIZE[name]
    ref = _build_reference(name)
    _train_mode_no_dropout(ref)

    variables = torch_to_podtpu(ref.state_dict(), name)
    x = normal((B, 3, size, size), seed=900)
    tgt = make_targets(B, T, C, 17)

    # --- torch side: forward (train-mode BN) + active loss + backward
    t_loss_fn = _torch_loss_fn(name, size)
    ref.zero_grad()
    t_out = ref(torch.from_numpy(x))
    t_loss = t_loss_fn(list(t_out) if isinstance(t_out, tuple) else t_out,
                       torch.from_numpy(tgt))
    t_loss.backward()
    t_grads = {k: p.grad for k, p in ref.named_parameters()}

    # --- jax side: same weights, same batch, jax.grad
    model = _podtpu_model(name)
    j_loss_fn = _jax_loss_fn(name, size)
    copy = lambda v: jnp.array(v, copy=True)  # noqa: E731 — see sgd test
    stats = jax.tree_util.tree_map(copy, variables["batch_stats"])
    params = jax.tree_util.tree_map(copy, variables["params"])
    x_j = jnp.asarray(nchw_to_nhwc(x))
    tgt_j = jnp.asarray(tgt)

    def scalar_loss(p):
        preds, _ = model.apply({"params": p, "batch_stats": stats}, x_j,
                               train=True, mutable=["batch_stats"])
        return j_loss_fn(preds, tgt_j)

    j_loss, j_grads = jax.value_and_grad(scalar_loss)(params)
    assert float(j_loss) == pytest.approx(float(t_loss), rel=2e-4)

    # map the jax grad tree into torch layout; running stats are dummies
    # (podtpu_to_torch needs them structurally; we only compare parameters)
    grads_torch_layout = podtpu_to_torch(
        {"params": jax.tree_util.tree_map(np.asarray, j_grads),
         "batch_stats": variables["batch_stats"]},
        name,
    )
    kind, bound = _GRAD_CRITERIA[name]
    if kind == "elementwise":
        errs = _grad_err_table(t_grads, grads_torch_layout)
        worst = max(errs, key=errs.get)
        assert errs[worst] <= bound, (
            f"{name}: worst grad mismatch {worst}: {errs[worst]:.2e}; "
            f"median {np.median(list(errs.values())):.2e}"
        )
    else:
        min_cos, max_norm_dev = bound
        table = _grad_direction_table(t_grads, grads_torch_layout)
        worst_cos = min(table, key=lambda k: table[k][0])
        worst_norm = max(table, key=lambda k: table[k][1])
        assert table[worst_cos][0] >= min_cos, (
            f"{name}: grad direction mismatch {worst_cos}: "
            f"cos={table[worst_cos][0]:.6f}")
        assert table[worst_norm][1] <= max_norm_dev, (
            f"{name}: grad magnitude mismatch {worst_norm}: "
            f"norm dev={table[worst_norm][1]:.4f}")


_TRAJ_STEPS = 20


def _run_trajectory(name: str, mutate: str | None = None) -> dict:
    """N optimizer steps in RE-SYNC lockstep with the live reference stack;
    returns per-step drift diagnostics (see the test docstring).

    Re-sync design: each step starts both sides from the reference's
    current weights (podtpu re-ports them after every compare), while the
    OPTIMIZER STATES evolve freely on both sides across all N steps. The
    compared quantity is the one-step parameter update and the one-step BN
    running-stat update. This keeps momentum buffers, weight-decay masking
    and the lr schedule fully exercised over the whole window, but removes
    chaotic trajectory divergence — a free-running variant was measured
    useless here (clean run: update cos 0.43, BN drift 111%; seeded bugs
    indistinguishable — the YOLO losses' argmax assignment flips amplify
    f32 round-off exponentially through 20 coupled steps).

    ``mutate`` injects a deliberate semantic bug into the podtpu side for
    bound calibration: ``no_nesterov`` | ``wd_x10`` | ``sched_off1``.
    """
    ref = _build_reference(name)
    _train_mode_no_dropout(ref)
    size = _SIZE[name]
    lr, momentum, wd = 1e-3, 0.9, 5e-4
    burn_in, decay_steps, scales = 5, [15], [0.1]
    n_steps = _TRAJ_STEPS
    if name == "yolov1":
        # 448^2 forwards are ~12x the 128^2 ones; a compressed window keeps
        # the same schedule phases (burn-in ramp, plateau, one step decay)
        # at a tractable runtime
        burn_in, decay_steps, n_steps = 3, [8], 12

    # kernel_keys split update metrics by numeric conditioning: kernel
    # gradients are well-conditioned (tight bound, where a decay-mask bug
    # shows), BN scales/biases carry cancellation-limited gradients
    # (looser bound, see _GRAD_CRITERIA)
    optim, kernel_keys = _build_torch_optimizer(ref, name, lr, momentum, wd)
    lr_mod = import_reference("module.lr_scheduler")
    sched = lr_mod.YoloLR(optim, burn_in=burn_in, steps=decay_steps,
                          scales=scales)

    t_loss_fn = _torch_loss_fn(name, size)
    model = _podtpu_model(name)
    j_loss_fn = _jax_loss_fn(name, size)

    variables = torch_to_podtpu(ref.state_dict(), name)
    copy = lambda v: jnp.array(v, copy=True)  # noqa: E731
    params = jax.tree_util.tree_map(copy, variables["params"])
    stats = jax.tree_util.tree_map(copy, variables["batch_stats"])

    from podtpu.train.optim import build_optimizer

    cfg = {"model": name, "optimizer": "sgd",
           "optimizer_options": {"lr": lr, "momentum": momentum,
                                 "nesterov": True, "weight_decay": wd},
           "scheduler": "yolo_lr",
           "scheduler_options": {"burn_in": burn_in, "steps": decay_steps,
                                 "scales": scales}}
    if mutate == "no_nesterov":
        cfg["optimizer_options"]["nesterov"] = False
    elif mutate == "wd_x10":
        cfg["optimizer_options"]["weight_decay"] = 10 * wd
    elif mutate == "sched_off1":
        cfg["scheduler_options"]["burn_in"] = burn_in + 1
    tx = build_optimizer(cfg, params)
    opt_state = tx.init(params)

    @jax.jit
    def j_step(params, stats, opt_state, x, tgt):
        def scalar_loss(p):
            preds, updates = model.apply(
                {"params": p, "batch_stats": stats}, x,
                train=True, mutable=["batch_stats"])
            return j_loss_fn(preds, tgt), updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            scalar_loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, new_stats, opt_state, loss

    loss_rel, kern_rel, other_rel, upd_cos, bn_rel = [], [], [], [], []
    worst = {"kern_key": "", "other_key": "", "cos_key": "", "bn_key": ""}
    for step in range(n_steps):
        x = normal((B, 3, size, size), seed=7000 + step)
        tgt = make_targets(B, T, C, 7500 + step)

        t_pre = {k: v.detach().clone() for k, v in ref.state_dict().items()}
        optim.zero_grad()
        t_out = ref(torch.from_numpy(x))
        t_loss = t_loss_fn(
            list(t_out) if isinstance(t_out, tuple) else t_out,
            torch.from_numpy(tgt))
        t_loss.backward()
        optim.step()
        sched.step()
        t_post = ref.state_dict()

        new_params, new_stats, opt_state, j_loss = j_step(
            params, stats, opt_state, jnp.asarray(nchw_to_nhwc(x)),
            jnp.asarray(tgt))
        t_scalar = float(t_loss.detach())
        loss_rel.append(
            abs(float(j_loss) - t_scalar) / max(abs(t_scalar), 1e-6))

        # One-step update comparison in torch layout: params and BN EWMAs.
        j_delta = jax.tree_util.tree_map(lambda a, b: np.asarray(a - b),
                                         new_params, params)
        j_sdelta = jax.tree_util.tree_map(lambda a, b: np.asarray(a - b),
                                          new_stats, stats)
        ported = podtpu_to_torch(
            {"params": j_delta, "batch_stats": j_sdelta}, name)
        step_kern, step_other, step_cos, step_bn = 0.0, 0.0, 1.0, 0.0
        for k in t_post:
            if "num_batches_tracked" in k:
                continue
            a = (t_post[k] - t_pre[k]).numpy().astype(np.float64).ravel()
            b = np.asarray(ported[k], np.float64).ravel()
            na, nb = np.linalg.norm(a), np.linalg.norm(b)
            if max(na, nb) < 1e-30:  # both zero (e.g. the lr=0 first step)
                continue
            if k.endswith(("running_mean", "running_var")):
                e = float(na and np.linalg.norm(a - b) / na)
                if e > step_bn:
                    step_bn, worst["bn_key"] = e, k
                continue
            e = float(np.linalg.norm(a - b)) / (na + 1e-30)
            if k in kernel_keys:
                if e > step_kern:
                    step_kern, worst["kern_key"] = e, k
            elif e > step_other:
                step_other, worst["other_key"] = e, k
            cos = float(a @ b / (na * nb + 1e-30))
            if cos < step_cos:
                step_cos, worst["cos_key"] = cos, k
        kern_rel.append(step_kern)
        other_rel.append(step_other)
        upd_cos.append(step_cos)
        bn_rel.append(step_bn)

        # Re-sync both weight sets to the reference for the next step;
        # optimizer states (torch momentum buffers / optax trace + count)
        # carry over untouched on both sides.
        variables = torch_to_podtpu(t_post, name)
        params = jax.tree_util.tree_map(copy, variables["params"])
        stats = jax.tree_util.tree_map(copy, variables["batch_stats"])

    return {"loss_rel": loss_rel, "kern_rel": kern_rel,
            "other_rel": other_rel, "upd_cos": upd_cos,
            "bn_rel": bn_rel, **worst}


@pytest.mark.parametrize("name", ["yolov1", "yolov2", "yolov3", "yolov4-tiny"])
def test_training_trajectory_lockstep(name):
    """20 full optimizer steps in lockstep with the live reference stack.

    Same ported init, same synthetic batches, through BOTH complete training
    recurrences: the reference's torch forward + active loss + autograd +
    3-group nesterov SGD (module/yolov3_detector.py:52-88) + YoloLR stepped
    per optimizer step (module/lr_scheduler.py:66-92), vs podtpu's jitted
    value_and_grad + optax chain + yolo_lr schedule. The 20-step window
    exercises the burn-in ramp (burn_in=5), the plateau, and one step decay
    (steps=[15], scales=[0.1]) — i.e. momentum-buffer init, nesterov
    composition, decay masking AND schedule indexing all have to agree for
    the trajectories to stay bounded. This is the strongest VOC-recipe
    parity proxy available without the dataset (VERDICT r2 item 2).

    Re-sync lockstep (see _run_trajectory): losses and one-step updates are
    compared at identical weights every step while optimizer states evolve
    across the window. Bounds are mutation-calibrated on yolov2
    (tools/traj_calibrate.py, RESULTS.md round-11): clean sits at
    kern_rel 0.031 / cos 0.9977 (the floor is the stem conv's
    cancellation-limited gradient, not optimizer semantics — constant
    across steps); nesterov-off and burn-in-off-by-one mutants blow past
    0.45 / drop below 0.89. A weight-decay mutation is sub-noise on v2 by
    recipe arithmetic (early gradients dwarf wd*|p|); decay-mask bugs are
    instead caught bit-level by test_sgd_step_parity on identical
    gradients — the two tests together cover the full update rule.

    yolov1 calibration (round-5, same tool): clean kern_rel 0.024 /
    cos 0.99938; no_nesterov 0.45/0.904, sched_off1 kern 0.68, and —
    unlike v2 — wd_x10 IS detected (other_rel 0.675, cos 0.842): v1's
    single-group decay acts on the large linear-head weights where wd*|p|
    rivals the gradient. Every mutant breaks at least one bound below.
    """
    d = _run_trajectory(name)
    assert max(d["loss_rel"]) <= 5e-5, (
        f"{name}: per-step loss drift "
        f"{['%.1e' % r for r in d['loss_rel']]}")
    assert max(d["kern_rel"]) <= 0.1, (
        f"{name}: kernel-group update mismatch {max(d['kern_rel']):.2e} "
        f"({d['kern_key']}); per-step "
        f"{['%.1e' % r for r in d['kern_rel']]}")
    assert max(d["other_rel"]) <= 0.2, (
        f"{name}: bn/bias-group update mismatch {max(d['other_rel']):.2e} "
        f"({d['other_key']})")
    assert min(d["upd_cos"]) >= 0.99, (
        f"{name}: one-step update direction {min(d['upd_cos']):.6f} "
        f"({d['cos_key']})")
    assert max(d["bn_rel"]) <= 1e-3, (
        f"{name}: BN running-stat update drift {max(d['bn_rel']):.2e} "
        f"({d['bn_key']})")


def test_sgd_step_parity():
    """3 nesterov-SGD steps with identical gradients produce identical
    parameters (torch 3-group SGD vs the optax kernel-mask chain)."""
    name = "yolov4-tiny"
    lr, momentum, wd = 1e-2, 0.9, 5e-3
    ref = _build_reference(name)

    # the reference's exact grouping (module/yolov3_detector.py:52-64)
    import torch.nn as nn

    g0, g1, g2 = [], [], []
    for v in ref.modules():
        if hasattr(v, "bias") and isinstance(v.bias, nn.Parameter):
            g2.append(v.bias)
        if isinstance(v, nn.BatchNorm2d):
            g0.append(v.weight)
        elif hasattr(v, "weight") and isinstance(v.weight, nn.Parameter):
            g1.append(v.weight)
    optim = torch.optim.SGD(g0, lr=lr, momentum=momentum, nesterov=True)
    optim.add_param_group({"params": g1, "weight_decay": wd})
    optim.add_param_group({"params": g2})
    n_grouped = sum(len(g) for g in (g0, g1, g2))
    assert n_grouped == len(list(ref.parameters()))

    variables = torch_to_podtpu(ref.state_dict(), name)
    # explicit copy: jnp.asarray on CPU can zero-copy the numpy views of
    # torch parameter memory, which torch's in-place optim.step() mutates
    params = jax.tree_util.tree_map(lambda v: jnp.array(v, copy=True),
                                    variables["params"])

    from podtpu.train.optim import build_optimizer

    cfg = {"model": name, "optimizer": "sgd",
           "optimizer_options": {"lr": lr, "momentum": momentum,
                                 "nesterov": True, "weight_decay": wd}}
    tx = build_optimizer(cfg, params)
    opt_state = tx.init(params)

    rng = np.random.default_rng(4)
    template = ref.state_dict()
    for step in range(3):
        # identical synthetic gradients on both sides (ported like weights)
        grads_sd = {}
        for k, v in template.items():
            if k.endswith(("running_mean", "running_var",
                           "num_batches_tracked")):
                grads_sd[k] = v
            else:
                grads_sd[k] = torch.from_numpy(
                    rng.normal(0, 0.01, v.shape).astype(np.float32))
        for k, p in ref.named_parameters():
            p.grad = grads_sd[k].clone()
        optim.step()

        j_grads = jax.tree_util.tree_map(
            jnp.asarray, torch_to_podtpu(grads_sd, name)["params"])
        updates, opt_state = tx.update(j_grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    ported = podtpu_to_torch(
        {"params": jax.tree_util.tree_map(np.asarray, params),
         "batch_stats": variables["batch_stats"]},
        name,
    )
    for k, p in ref.named_parameters():
        a = p.detach().numpy()
        b = ported[k]
        scale = max(float(np.abs(a).max()), 1e-6)
        err = float(np.abs(a - b).max()) / scale
        assert err <= 1e-6, f"{k}: {err:.2e}"
