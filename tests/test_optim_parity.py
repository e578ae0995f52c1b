"""Optimizer parity: the optax chain (coupled weight decay on kernels only +
nesterov momentum) must reproduce torch.optim.SGD with the reference's
3-param-group setup (module/yolov3_detector.py:52-64) step-for-step."""

import numpy as np
import optax
import pytest

import jax.numpy as jnp

from podtpu.train.optim import build_optimizer

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("flat", [False, True])
def test_sgd_nesterov_coupled_decay_matches_torch(flat):
    rng = np.random.default_rng(0)
    w_kernel = rng.normal(0, 1, (4, 3)).astype(np.float32)
    w_bias = rng.normal(0, 1, (3,)).astype(np.float32)
    w_scale = rng.normal(1, 0.1, (3,)).astype(np.float32)
    grads_seq = [
        {"kernel": rng.normal(0, 1, (4, 3)).astype(np.float32),
         "bias": rng.normal(0, 1, (3,)).astype(np.float32),
         "scale": rng.normal(0, 1, (3,)).astype(np.float32)}
        for _ in range(5)
    ]

    cfg = {
        "optimizer": "sgd",
        "optimizer_options": {"lr": 0.01, "momentum": 0.9, "nesterov": True,
                              "weight_decay": 0.05, "flat": flat},
        "scheduler": None,
    }
    params = {"kernel": jnp.asarray(w_kernel), "bias": jnp.asarray(w_bias),
              "scale": jnp.asarray(w_scale)}
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    for g in grads_seq:
        gj = {k: jnp.asarray(v) for k, v in g.items()}
        upd, state = tx.update(gj, state, params)
        params = optax.apply_updates(params, upd)

    tk = torch.tensor(w_kernel, requires_grad=True)
    tb = torch.tensor(w_bias, requires_grad=True)
    ts = torch.tensor(w_scale, requires_grad=True)
    # reference grouping: BN scale (no decay), kernels (decay), biases (none)
    opt = torch.optim.SGD([ts], lr=0.01, momentum=0.9, nesterov=True)
    opt.add_param_group({"params": [tk], "weight_decay": 0.05})
    opt.add_param_group({"params": [tb]})
    for g in grads_seq:
        tk.grad = torch.tensor(g["kernel"])
        tb.grad = torch.tensor(g["bias"])
        ts.grad = torch.tensor(g["scale"])
        opt.step()

    np.testing.assert_allclose(np.asarray(params["kernel"]),
                               tk.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["bias"]),
                               tb.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["scale"]),
                               ts.detach().numpy(), atol=1e-6)


def test_clip_grad_norm_engages():
    cfg = {
        "optimizer": "sgd",
        "optimizer_options": {"lr": 1.0, "clip_grad_norm": 1.0},
        "scheduler": None,
    }
    params = {"kernel": jnp.zeros((4,))}
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    big = {"kernel": jnp.full((4,), 100.0)}
    upd, _ = tx.update(big, state, params)
    norm = float(jnp.linalg.norm(upd["kernel"]))
    assert norm == pytest.approx(1.0, rel=1e-4)  # clipped to unit global norm


def test_gradient_accumulation_matches_big_batch():
    """accum_steps=k over k micro-batch mean-gradients must equal one SGD
    step on the union batch (optax.MultiSteps averages, momentum/schedule
    advance once per k micro-steps)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from podtpu.train.optim import build_optimizer

    params = {"conv": {"kernel": jnp.ones((4,)) * 0.5},
              "bn": {"scale": jnp.ones((4,))}}
    base = dict(optimizer="sgd",
                optimizer_options={"lr": 0.1, "momentum": 0.9,
                                   "weight_decay": 1e-2},
                scheduler="multi_step",
                scheduler_options={"milestones": [1000], "gamma": 0.1})
    r = np.random.default_rng(0)
    g1 = jax.tree_util.tree_map(
        lambda p: jnp.asarray(r.normal(size=p.shape), jnp.float32), params)
    g2 = jax.tree_util.tree_map(
        lambda p: jnp.asarray(r.normal(size=p.shape), jnp.float32), params)
    gmean = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)

    # big-batch reference: one step with the averaged gradient
    tx_big = build_optimizer(base, params)
    s = tx_big.init(params)
    upd, _ = tx_big.update(gmean, s, params)
    p_big = jax.tree_util.tree_map(lambda p, u: p + u, params, upd)

    # accumulated: two micro-steps
    cfg2 = dict(base)
    cfg2["optimizer_options"] = {**base["optimizer_options"],
                                 "accum_steps": 2}
    tx_acc = build_optimizer(cfg2, params)
    s = tx_acc.init(params)
    p_acc = params
    for g in (g1, g2):
        upd, s = tx_acc.update(g, s, p_acc)
        p_acc = jax.tree_util.tree_map(lambda p, u: p + u, p_acc, upd)

    for a, b in zip(jax.tree_util.tree_leaves(p_big),
                    jax.tree_util.tree_leaves(p_acc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


@pytest.mark.parametrize("model,expect_bias_decay", [
    ("yolov1", True), ("yolov2", True),
    ("yolov3", False), ("yolov4-tiny", False),
])
def test_decay_policy_family_defaults(model, expect_bias_decay):
    """v1/v2 default to the reference's single-group decay-all
    (yolov1_detector.py:47-56 / yolov2_detector.py:48-52 pass raw
    model.parameters()); v3/v4-tiny keep the 3-group kernel-only mask
    (yolov3_detector.py:52-64). One SGD step with zero gradients isolates
    the decay term: a decayed leaf moves by -lr*wd*p, an exempt one stays."""
    lr, wd = 0.1, 0.5
    cfg = {"model": model, "optimizer": "sgd",
           "optimizer_options": {"lr": lr, "weight_decay": wd},
           "scheduler": None}
    params = {"conv": {"kernel": jnp.ones((2, 2)), "bias": jnp.ones((2,))},
              "bn": {"scale": jnp.ones((2,))}}
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    zeros = {"conv": {"kernel": jnp.zeros((2, 2)),
                      "bias": jnp.zeros((2,))},
             "bn": {"scale": jnp.zeros((2,))}}
    upd, _ = tx.update(zeros, state, params)
    new = optax.apply_updates(params, upd)

    # kernels decay under BOTH policies
    np.testing.assert_allclose(np.asarray(new["conv"]["kernel"]),
                               1.0 - lr * wd, rtol=1e-6)
    moved = abs(float(new["conv"]["bias"][0]) - 1.0) > 1e-8
    assert moved == expect_bias_decay
    moved_scale = abs(float(new["bn"]["scale"][0]) - 1.0) > 1e-8
    assert moved_scale == expect_bias_decay

    # explicit override beats the family default
    cfg_over = {**cfg, "optimizer_options":
                {"lr": lr, "weight_decay": wd,
                 "decay_policy": "kernels" if expect_bias_decay else "all"}}
    tx2 = build_optimizer(cfg_over, params)
    upd2, _ = tx2.update(zeros, tx2.init(params), params)
    new2 = optax.apply_updates(params, upd2)
    moved2 = abs(float(new2["conv"]["bias"][0]) - 1.0) > 1e-8
    assert moved2 != expect_bias_decay
