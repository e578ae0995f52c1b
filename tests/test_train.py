"""Training-stack tests: optimizer masking, train step, multi-chip DP mesh,
and a loss-decreases smoke train (the reference has no tests; SURVEY.md §4
calls for fixed-seed step tests + a mesh test on 8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from podtpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
from podtpu.train.optim import kernel_decay_mask
from podtpu.train.state import create_train_state, param_count
from podtpu.train.steps import make_eval_step, make_train_step

TINY_CFG = {
    "model": "yolov4-tiny",
    "num_classes": 4,
    "input_size": 64,
    "in_channels": 3,
    "compute_dtype": "float32",
    "anchors": [
        [4, 5], [6, 8], [10, 9], [12, 16], [18, 14],
        [20, 24], [32, 28], [40, 44], [56, 52],
    ],
    "conf_threshold": 0.25,
    "max_annots": 8,
    "optimizer": "sgd",
    "optimizer_options": {
        "lr": 1e-3, "momentum": 0.9, "weight_decay": 1e-4, "nesterov": True,
    },
    "scheduler": "yolo_lr",
    "scheduler_options": {"burn_in": 5, "steps": [1000], "scales": [0.1]},
    "top_k_candidates": 64,
    "max_detections": 10,
}


def tiny_batch(batch_size=4, seed=0):
    r = np.random.default_rng(seed)
    imgs = r.uniform(0, 1, (batch_size, 64, 64, 3)).astype(np.float32)
    annot = -np.ones((batch_size, 8, 5), np.float32)
    for b in range(batch_size):
        annot[b, 0] = [0.5, 0.5, 0.4, 0.4, b % 4]
    return {"img": imgs, "annot": annot}


@pytest.fixture(scope="module")
def state():
    return create_train_state(TINY_CFG, jax.random.PRNGKey(0))


def test_param_count_positive(state):
    assert param_count(state.params) > 1_000_000  # v4-tiny ~5.9M


def test_decay_mask_targets_kernels_only(state):
    mask = kernel_decay_mask(state.params)
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    for path, decay in flat:
        key = path[-1].key
        if key == "kernel":
            assert decay
        else:
            assert not decay, f"{path} should not decay"


@pytest.mark.slow
def test_train_step_decreases_loss(state):
    """Fixed batch, repeated steps -> the loss must go down (overfit check)."""
    step = make_train_step(TINY_CFG, mesh=None, donate=False)
    batch = jax.tree_util.tree_map(jnp.asarray, tiny_batch())
    rng = jax.random.PRNGKey(1)
    s = state
    losses = []
    for _ in range(12):
        s, metrics = step(s, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(s.step) == 12


@pytest.mark.slow
@pytest.mark.parametrize("policy", ["conv_out", "no_post_act"])
def test_remat_policy_step_parity(state, policy):
    """Fine-grained remat (recompute BN-apply/act in backward from saved
    conv outputs — steps.py::remat_policy) only reschedules work; the step
    must be bit-identical to the default AD residual choice."""
    batch = jax.tree_util.tree_map(jnp.asarray, tiny_batch())
    rng = jax.random.PRNGKey(1)
    s_ref, m_ref = make_train_step(TINY_CFG, mesh=None, donate=False)(
        state, batch, rng)
    cfg = dict(TINY_CFG, remat_policy=policy)
    s_pol, m_pol = make_train_step(cfg, mesh=None, donate=False)(
        state, batch, rng)
    assert float(m_pol["loss"]) == float(m_ref["loss"])
    for a, b in zip(jax.tree_util.tree_leaves(s_pol.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_batch_stats_update(state):
    step = make_train_step(TINY_CFG, mesh=None, donate=False)
    batch = jax.tree_util.tree_map(jnp.asarray, tiny_batch())
    s2, _ = step(state, batch, jax.random.PRNGKey(0))
    before = jax.tree_util.tree_leaves(state.batch_stats)
    after = jax.tree_util.tree_leaves(s2.batch_stats)
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(before, after)
    )
    assert changed, "BN running stats did not update"


@pytest.mark.slow
def test_eval_step_outputs(state):
    eval_step = make_eval_step(TINY_CFG, mesh=None)
    batch = jax.tree_util.tree_map(jnp.asarray, tiny_batch())
    loss, dets, valid = eval_step(state, batch)
    assert np.isfinite(float(loss))
    assert dets.shape == (4, 10, 6)
    assert valid.shape == (4, 10)


@pytest.mark.slow
def test_multichip_dp_mesh():
    """Full DP train step over the 8 virtual CPU devices; parity with the
    single-device step on the same global batch."""
    assert len(jax.devices()) == 8, "conftest should fake 8 cpu devices"
    mesh = make_mesh()
    state = create_train_state(TINY_CFG, jax.random.PRNGKey(0))
    state_repl = jax.device_put(state, replicated_sharding(mesh))
    batch = tiny_batch(batch_size=8)
    sharded = shard_batch(batch, mesh)

    step_dp = make_train_step(TINY_CFG, mesh, donate=False)
    rng = jax.random.PRNGKey(1)
    s_dp, m_dp = step_dp(state_repl, sharded, rng)

    step_1 = make_train_step(TINY_CFG, mesh=None, donate=False)
    batch_1 = jax.tree_util.tree_map(jnp.asarray, batch)
    s_1, m_1 = step_1(state, batch_1, rng)

    # same global batch => identical loss and identical updated params
    assert float(m_dp["loss"]) == pytest.approx(float(m_1["loss"]), rel=1e-5)
    p_dp = jax.tree_util.tree_leaves(s_dp.params)
    p_1 = jax.tree_util.tree_leaves(s_1.params)
    for a, b in zip(p_dp, p_1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)


@pytest.mark.slow
def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_skip_nonfinite_guard():
    """optimizer_options.skip_nonfinite: non-finite updates are dropped on
    device and counted; past the consecutive limit they apply (NaN surfaces
    instead of a silent stall)."""
    import optax

    from podtpu.train.optim import build_optimizer, total_notfinite

    cfg = {"optimizer": "sgd",
           "optimizer_options": {"lr": 0.1, "skip_nonfinite": 2},
           "scheduler": "multi_step",
           "scheduler_options": {"milestones": [1000], "gamma": 0.1},
           "epochs": 1}
    params = {"w": jnp.ones((4,))}
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    assert total_notfinite(state) == 0

    good = {"w": jnp.full((4,), 0.5)}
    bad = {"w": jnp.full((4,), jnp.nan)}

    up, state = tx.update(good, state, params)
    params = optax.apply_updates(params, up)
    assert np.isfinite(np.asarray(params["w"])).all()

    up, state = tx.update(bad, state, params)
    params2 = optax.apply_updates(params, up)
    # dropped: params unchanged, counter advanced
    np.testing.assert_array_equal(np.asarray(params2["w"]),
                                  np.asarray(params["w"]))
    assert total_notfinite(state) == 1

    # a finite step resets the consecutive count
    up, state = tx.update(good, state, params2)
    params3 = optax.apply_updates(params2, up)
    assert np.isfinite(np.asarray(params3["w"])).all()

    # beyond `skip` consecutive failures the update applies -> NaN surfaces
    p = params3
    for _ in range(3):
        up, state = tx.update(bad, state, p)
        p = optax.apply_updates(p, up)
    assert not np.isfinite(np.asarray(p["w"])).all()
    assert total_notfinite(state) >= 3

    # without the knob the helper reports None (guard inactive)
    cfg2 = {"optimizer": "sgd", "optimizer_options": {"lr": 0.1},
            "scheduler": "multi_step",
            "scheduler_options": {"milestones": [1000], "gamma": 0.1},
            "epochs": 1}
    tx2 = build_optimizer(cfg2, {"w": jnp.ones((4,))})
    assert total_notfinite(tx2.init({"w": jnp.ones((4,))})) is None


@pytest.mark.slow  # full train-step jit compile
def test_skip_nonfinite_protects_batch_stats(state):
    """A non-finite batch must not poison the BN running statistics while
    the guard is dropping the param update (a NaN in the EWMA would stay
    NaN forever and silently break every later eval)."""
    from podtpu.train.optim import total_notfinite

    cfg = dict(TINY_CFG)
    cfg["optimizer_options"] = dict(
        TINY_CFG["optimizer_options"], skip_nonfinite=5)
    s = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, mesh=None, donate=False)
    rng = jax.random.PRNGKey(1)

    bad = tiny_batch()
    bad["img"][0, 0, 0, 0] = np.nan
    s2, metrics = step(s, jax.tree_util.tree_map(jnp.asarray, bad), rng)
    assert total_notfinite(s2.opt_state) == 1
    # params untouched AND batch_stats untouched (both finite)
    for a, b in zip(jax.tree_util.tree_leaves(s.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(s.batch_stats),
                    jax.tree_util.tree_leaves(s2.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a good batch afterwards updates both params and stats
    s3, _ = step(s2, jax.tree_util.tree_map(jnp.asarray, tiny_batch()), rng)
    assert total_notfinite(s3.opt_state) == 1  # total is cumulative
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(s2.batch_stats),
                        jax.tree_util.tree_leaves(s3.batch_stats)))
    assert changed, "finite step did not update batch_stats"
    for leaf in jax.tree_util.tree_leaves(s3.batch_stats):
        assert np.isfinite(np.asarray(leaf)).all()
