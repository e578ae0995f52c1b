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
from podtpu.losses import yolov2_loss_v2, yolov3_loss_v2  # noqa: E402
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


def _build_reference(name: str):
    torch.manual_seed(7)
    dk = import_reference("models.backbone.darknet")
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
_GRAD_CRITERIA = {"yolov4-tiny": ("elementwise", 2e-3),
                  "yolov2": ("direction", (0.999, 0.02)),
                  "yolov3": ("direction", (0.999, 0.02))}


@pytest.mark.parametrize("name", ["yolov2", "yolov3", "yolov4-tiny"])
def test_gradient_parity(name):
    ref = _build_reference(name)
    ref.train()

    variables = torch_to_podtpu(ref.state_dict(), name)
    x = normal((B, 3, S, S), seed=900)
    tgt = make_targets(B, T, C, 17)

    # --- torch side: forward (train-mode BN) + active loss + backward
    if name == "yolov2":
        loss_mod = import_reference("models.loss.yolov2_loss")
        t_loss_fn = loss_mod.YoloV2LossV2(C, VOC_SCALED_ANCHORS)
    else:
        loss_mod = import_reference("models.loss.yolov3_loss")
        t_loss_fn = loss_mod.YoloV3LossV2(C, VOC_ANCHORS, S)
    ref.zero_grad()
    t_out = ref(torch.from_numpy(x))
    t_loss = t_loss_fn(list(t_out) if isinstance(t_out, tuple) else t_out,
                       torch.from_numpy(tgt))
    t_loss.backward()
    t_grads = {k: p.grad for k, p in ref.named_parameters()}

    # --- jax side: same weights, same batch, jax.grad
    model = {"yolov2": lambda: YoloV2(num_classes=C, num_anchors=5),
             "yolov3": lambda: YoloV3(num_classes=C, num_anchors=9),
             "yolov4-tiny": lambda: YoloV4Tiny(num_classes=C,
                                               num_anchors=9)}[name]()
    copy = lambda v: jnp.array(v, copy=True)  # noqa: E731 — see sgd test
    stats = jax.tree_util.tree_map(copy, variables["batch_stats"])
    params = jax.tree_util.tree_map(copy, variables["params"])
    x_j = jnp.asarray(nchw_to_nhwc(x))
    tgt_j = jnp.asarray(tgt)

    def scalar_loss(p):
        preds, _ = model.apply({"params": p, "batch_stats": stats}, x_j,
                               train=True, mutable=["batch_stats"])
        if name == "yolov2":
            return yolov2_loss_v2(preds, tgt_j, C, VOC_SCALED_ANCHORS)
        return yolov3_loss_v2(preds, tgt_j, C, VOC_ANCHORS, S)

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
