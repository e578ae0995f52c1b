"""EMA shadow weights (cfg ``ema``) — YOLOv5 ModelEMA semantics.

The reference's dormant ``strip_optimizer`` (utils/general.py:735-744)
expects checkpoints that may carry an ``ema`` entry and replaces the model
with it when present; this is the training-side producer of that surface.
Locks: the update math against a numpy oracle of the ModelEMA recurrence
(decay ramp ``d = decay * (1 - exp(-updates / tau))`` over params AND BN
buffers), checkpoint save/restore/--use-ema selection, auto-EMA eval
restore, and resume of a pre-EMA checkpoint into an EMA-enabled config.
"""

import jax
import numpy as np
import pytest

from podtpu.train.state import create_train_state, ema_options
from podtpu.train.steps import make_train_step
from podtpu.train.trainer import (
    CheckpointIO,
    restore_eval_weights,
    restore_weights,
)

from test_train import TINY_CFG, tiny_batch

EMA_CFG = {**TINY_CFG, "ema": {"decay": 0.99, "tau": 4.0}}


def _flat(tree):
    return {jax.tree_util.keystr(p): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def test_ema_options_parsing():
    assert ema_options({}) is None
    assert ema_options({"ema": False}) is None
    d = ema_options({"ema": True})
    assert d == {"decay": 0.9999, "tau": 2000.0, "eval": True}
    d = ema_options({"ema": {"decay": 0.95, "eval": False}})
    assert d == {"decay": 0.95, "tau": 2000.0, "eval": False}
    # a bare number reads as the decay (ema: 0.995)
    d = ema_options({"ema": 0.995})
    assert d == {"decay": 0.995, "tau": 2000.0, "eval": True}


@pytest.mark.slow
def test_ema_update_matches_modelema_oracle():
    """state.ema after k steps == the ModelEMA recurrence applied to the
    recorded (params, batch_stats) trajectory."""
    state = create_train_state(EMA_CFG, jax.random.PRNGKey(0))
    assert state.ema is not None
    step = make_train_step(EMA_CFG, donate=False)
    rng = jax.random.PRNGKey(1)

    shadow = {k: dict(v) for k, v in
              (("params", _flat(state.params)),
               ("batch_stats", _flat(state.batch_stats)))}
    decay, tau = 0.99, 4.0
    for k in range(1, 4):
        state, _ = step(state, tiny_batch(seed=k), rng)
        d = decay * (1.0 - np.exp(-k / tau))
        src = {"params": _flat(state.params),
               "batch_stats": _flat(state.batch_stats)}
        for coll in shadow:
            for name, e in shadow[coll].items():
                shadow[coll][name] = e * d + src[coll][name] * (1.0 - d)

    got = {"params": _flat(state.ema["params"]),
           "batch_stats": _flat(state.ema["batch_stats"])}
    for coll in shadow:
        assert shadow[coll].keys() == got[coll].keys()
        for name, want in shadow[coll].items():
            np.testing.assert_allclose(
                got[coll][name], want, rtol=1e-5, atol=1e-6,
                err_msg=f"{coll}{name}")


@pytest.mark.slow
def test_ema_shadow_moves_off_init_but_lags_params():
    state = create_train_state(EMA_CFG, jax.random.PRNGKey(0))
    init = _flat(state.ema["params"])
    step = make_train_step(EMA_CFG, donate=False)
    for k in range(3):  # step 0 is inside the yolo_lr burn-in (lr=0)
        state, _ = step(state, tiny_batch(seed=k), jax.random.PRNGKey(1))
    p = _flat(state.params)
    e = _flat(state.ema["params"])
    moved = [k for k in p if not np.array_equal(p[k], init[k])]
    assert moved  # the step changed params
    # the shadow followed (no longer the init) but is not the raw params
    # bit-for-bit (d>0 keeps a share of the init after one step)
    assert any(not np.array_equal(e[k], init[k]) for k in moved)
    assert any(not np.array_equal(e[k], p[k]) for k in moved)


@pytest.mark.slow
def test_disabled_by_default():
    state = create_train_state(TINY_CFG, jax.random.PRNGKey(0))
    assert state.ema is None
    step = make_train_step(TINY_CFG, donate=False)
    state, _ = step(state, tiny_batch(), jax.random.PRNGKey(1))
    assert state.ema is None


@pytest.mark.slow
def test_checkpoint_roundtrip_and_use_ema(tmp_path):
    state = create_train_state(EMA_CFG, jax.random.PRNGKey(0))
    step = make_train_step(EMA_CFG, donate=False)
    state, _ = step(state, tiny_batch(), jax.random.PRNGKey(1))

    io = CheckpointIO(str(tmp_path))
    io.save("last", state)
    io.wait()

    # full-state restore round-trips the shadow
    fresh = create_train_state(EMA_CFG, jax.random.PRNGKey(2))
    restored = io.restore(str(tmp_path / "last"), fresh)
    for k, v in _flat(state.ema).items():
        np.testing.assert_array_equal(_flat(restored.ema)[k], v)

    # --use-ema loads the shadow AS the weights (strip_optimizer's
    # ``model = ema`` step)
    got = restore_weights(str(tmp_path / "last"), fresh, use_ema=True)
    np.testing.assert_array_equal(
        list(_flat(got.params).values())[0],
        list(_flat(state.ema["params"]).values())[0])
    # ...and its batch_stats come from the shadow too
    np.testing.assert_array_equal(
        list(_flat(got.batch_stats).values())[0],
        list(_flat(state.ema["batch_stats"]).values())[0])

    # plain restore keeps the raw weights
    raw = restore_weights(str(tmp_path / "last"), fresh)
    np.testing.assert_array_equal(
        list(_flat(raw.params).values())[0],
        list(_flat(state.params).values())[0])

    # auto mode (ema.eval defaults on) follows the Trainer: EMA weights
    auto = restore_eval_weights(str(tmp_path / "last"), fresh, EMA_CFG)
    np.testing.assert_array_equal(
        list(_flat(auto.params).values())[0],
        list(_flat(state.ema["params"]).values())[0])


def test_pre_ema_checkpoint_restores_into_ema_config(tmp_path):
    """Enabling EMA on resume: the old checkpoint has no shadow — restore
    keeps the fresh shadow (and eval restore falls back to raw weights)."""
    plain = create_train_state(TINY_CFG, jax.random.PRNGKey(0))
    io = CheckpointIO(str(tmp_path))
    io.save("last", plain)
    io.wait()

    ema_state = create_train_state(EMA_CFG, jax.random.PRNGKey(3))
    restored = io.restore(str(tmp_path / "last"), ema_state)
    np.testing.assert_array_equal(
        list(_flat(restored.params).values())[0],
        list(_flat(plain.params).values())[0])
    # the shadow reseeds from the RESTORED weights (not the random init —
    # the warmed decay ramp would otherwise keep scoring near-init weights)
    assert restored.ema is not None
    np.testing.assert_array_equal(
        list(_flat(restored.ema["params"]).values())[0],
        list(_flat(plain.params).values())[0])

    # auto eval restore: falls back to the raw weights
    got = restore_eval_weights(str(tmp_path / "last"), ema_state, EMA_CFG)
    np.testing.assert_array_equal(
        list(_flat(got.params).values())[0],
        list(_flat(plain.params).values())[0])

    # explicit --use-ema on a shadow-less checkpoint fails loudly
    with pytest.raises(ValueError, match="no EMA shadow"):
        restore_weights(str(tmp_path / "last"), ema_state, use_ema=True)


def test_trainer_eval_state_uses_shadow():
    from podtpu.train.trainer import Trainer

    cfg = {**EMA_CFG, "batch_size": 4}
    tr = Trainer(cfg, eval_only=True, log=lambda *_: None, use_mesh=False)
    es = tr._eval_state()
    assert es.params is tr.state.ema["params"]
    assert es.ema is None  # eval states never carry the shadow

    cfg_off = {**EMA_CFG, "ema": {"decay": 0.99, "eval": False},
               "batch_size": 4}
    tr2 = Trainer(cfg_off, eval_only=True, log=lambda *_: None,
                  use_mesh=False)
    es2 = tr2._eval_state()
    assert es2.params is tr2.state.params  # raw weights when eval: false
    assert es2.ema is None


def test_ema_checkpoint_restores_into_plain_config(tmp_path):
    """The reverse direction: an EMA-trained checkpoint evaluated/resumed
    under a config WITHOUT ema — the shadow entry is tolerated and
    dropped."""
    ema_state = create_train_state(EMA_CFG, jax.random.PRNGKey(0))
    io = CheckpointIO(str(tmp_path))
    io.save("last", ema_state)
    io.wait()

    plain = create_train_state(TINY_CFG, jax.random.PRNGKey(1))
    got = restore_weights(str(tmp_path / "last"), plain)
    np.testing.assert_array_equal(
        list(_flat(got.params).values())[0],
        list(_flat(ema_state.params).values())[0])
    assert got.ema is None

    resumed = io.restore(str(tmp_path / "last"), plain)
    assert resumed.ema is None
    np.testing.assert_array_equal(
        list(_flat(resumed.params).values())[0],
        list(_flat(ema_state.params).values())[0])


def test_npz_load_reseeds_shadow(tmp_path):
    """Loading npz weights into an EMA-enabled state reseeds the shadow from
    the loaded weights (convert_checkpoint npz->orbax, backbone_pretrained)."""
    from podtpu.export.weights import load_npz_weights, save_npz_weights

    src = create_train_state(TINY_CFG, jax.random.PRNGKey(7))
    npz = str(tmp_path / "w.npz")
    save_npz_weights(src, npz)

    dst = create_train_state(EMA_CFG, jax.random.PRNGKey(8))
    dst = load_npz_weights(dst, npz)
    np.testing.assert_array_equal(
        list(_flat(dst.ema["params"]).values())[0],
        list(_flat(src.params).values())[0])


@pytest.mark.slow
def test_ema_blends_once_per_optimizer_update_under_accum():
    """With gradient accumulation the shadow blends once per OPTIMIZER
    update (k micro-steps), not k times — k identical blends would compound
    retention to decay**k vs ModelEMA's single update per optimizer.step()."""
    decay, tau, k = 0.9, 8.0, 2
    cfg = {**TINY_CFG, "ema": {"decay": decay, "tau": tau},
           "optimizer_options": {**TINY_CFG["optimizer_options"],
                                 "accum_steps": k}}
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg, donate=False)
    shadow = _flat(state.ema["params"])
    rng = jax.random.PRNGKey(1)
    for u in range(1, 3):  # two optimizer updates = four micro-steps
        for m in range(k):
            state, _ = step(state, tiny_batch(seed=u * k + m), rng)
        d = decay * (1.0 - np.exp(-u / tau))
        src = _flat(state.params)
        shadow = {n: e * d + src[n] * (1.0 - d) for n, e in shadow.items()}
    got = _flat(state.ema["params"])
    for n, want in shadow.items():
        np.testing.assert_allclose(got[n], want, rtol=1e-5, atol=1e-6,
                                   err_msg=n)
