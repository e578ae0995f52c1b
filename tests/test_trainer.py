"""Trainer end-to-end: fit on a tiny synthetic dataset, checkpoints, resume,
validate — the CPU-runnable convergence smoke SURVEY.md §4 calls for."""

import os

import numpy as np
import pytest

from podtpu.data import Loader
from podtpu.data.dataset import YoloTxtDataset
from podtpu.data.synthetic import generate
from podtpu.train.trainer import Trainer, restore_weights

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    data_dir = tmp_path_factory.mktemp("data")
    info = generate(str(data_dir), n_train=8, n_val=4, size=96,
                    num_classes=2, max_objects=2, seed=3)
    cfg = {
        "model": "yolov4-tiny",
        "dataset_name": "synth",
        "num_classes": 2,
        "input_size": 96,
        "in_channels": 3,
        "compute_dtype": "float32",
        "anchors": [[8, 8], [12, 16], [16, 12], [20, 24], [28, 22],
                    [32, 36], [44, 40], [56, 60], [72, 68]],
        "conf_threshold": 0.25,
        "max_annots": 4,
        "epochs": 2,
        "batch_size": 4,
        "workers": 2,
        "save_freq": 1,
        "save_dir": str(tmp_path_factory.mktemp("runs")),
        "trainer_options": {"check_val_every_n_epoch": 1},
        "early_stopping_patience": 30,
        "optimizer": "sgd",
        "optimizer_options": {"lr": 1e-3, "momentum": 0.9,
                              "weight_decay": 1e-4, "nesterov": True},
        "scheduler": "yolo_lr",
        "scheduler_options": {"burn_in": 4, "steps": [100], "scales": [0.1]},
        "top_k_candidates": 64,
        "max_detections": 10,
        "log_images": 2,  # exercise tagged-detection TB panels each val
        "train_list": info["train_list"],
        "val_list": info["val_list"],
        "names": info["names"],
        "seed": 0,
    }
    return cfg


def _loaders(cfg):
    train_ds = YoloTxtDataset(cfg["train_list"], cfg["input_size"], True,
                              "simple")
    val_ds = YoloTxtDataset(cfg["val_list"], cfg["input_size"], False,
                            "simple")
    mk = lambda ds, sh: Loader(ds, batch_size=4, shuffle=sh,
                               max_annots=4, workers=2, seed=0)
    return mk(train_ds, True), mk(val_ds, False)


@pytest.mark.slow
def test_fit_validate_checkpoint_resume(setup):
    cfg = setup
    train_loader, val_loader = _loaders(cfg)
    trainer = Trainer(cfg, log=lambda *_: None)
    history = trainer.fit(train_loader, val_loader, epochs=2)

    assert len(history) == 2
    assert {"train_loss", "lr", "val_loss", "val_mAP"} <= set(history[-1])
    assert np.isfinite(history[-1]["train_loss"])
    ckpt_dir = os.path.join(trainer.run_dir, "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "last"))
    assert os.path.isdir(os.path.join(ckpt_dir, "best"))
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch_0000"))

    # resume restores the step counter
    trainer2 = Trainer(cfg, log=lambda *_: None)
    assert int(trainer2.state.step) == 0
    trainer2.state = trainer2.ckpt.restore(
        os.path.join(ckpt_dir, "last"), trainer2.state
    )
    assert int(trainer2.state.step) == int(trainer.state.step) > 0

    # weights-only restore + validate
    trainer3 = Trainer(cfg, log=lambda *_: None)
    trainer3.state = restore_weights(
        os.path.join(ckpt_dir, "best"), trainer3.state
    )
    result = trainer3.validate(val_loader)
    assert np.isfinite(result["val_loss"])
    assert 0.0 <= result["val_mAP"] <= 1.0


@pytest.mark.slow
def test_early_stopping(setup):
    """Patience counts stale validation rounds (reference: patience=30 on
    val_loss; here patience=1 with val every epoch must stop early)."""
    cfg = dict(setup)
    cfg["early_stopping_patience"] = 1
    cfg["trainer_options"] = {"check_val_every_n_epoch": 1}
    cfg["optimizer_options"] = dict(cfg["optimizer_options"], lr=0.0)  # frozen
    train_loader, val_loader = _loaders(cfg)
    trainer = Trainer(cfg, log=lambda *_: None)
    history = trainer.fit(train_loader, val_loader, epochs=10)
    # with lr=0 the val loss never improves after round 1 -> stop at epoch 2
    assert len(history) <= 3


@pytest.mark.slow
def test_train_cli_subprocess(tmp_path):
    """Drive the real `python train.py --cfg ... --platform cpu` surface."""
    import subprocess
    import sys

    import yaml

    from podtpu.data.synthetic import generate

    info = generate(str(tmp_path / "data"), n_train=8, n_val=4, size=96,
                    num_classes=2, max_objects=2, seed=5)
    cfg = {
        "model": "yolov4-tiny", "dataset_name": "clismoke", "num_classes": 2,
        "input_size": 96, "in_channels": 3, "compute_dtype": "float32",
        "anchors": [[8, 8], [12, 16], [16, 12], [20, 24], [28, 22],
                    [32, 36], [44, 40], [56, 60], [72, 68]],
        "epochs": 1, "batch_size": 4, "workers": 2, "max_annots": 4,
        "save_dir": str(tmp_path / "runs"), "save_freq": 1,
        "trainer_options": {"check_val_every_n_epoch": 1},
        "optimizer": "sgd", "optimizer_options": {"lr": 1e-3},
        "scheduler": "yolo_lr",
        "scheduler_options": {"burn_in": 2, "steps": [100], "scales": [0.1]},
        "top_k_candidates": 64, "max_detections": 10,
        "train_list": info["train_list"], "val_list": info["val_list"],
        "names": info["names"],
    }
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "train.py"), "--cfg",
         str(cfg_path), "--platform", "cpu"],
        capture_output=True, text=True, timeout=600, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "epoch 0" in proc.stdout
    assert "val_mAP" in proc.stdout


@pytest.mark.slow
def test_swa_checkpoint(setup):
    cfg = dict(setup)
    cfg["swa"] = {"start_epoch": 0}
    train_loader, val_loader = _loaders(cfg)
    trainer = Trainer(cfg, log=lambda *_: None)
    trainer.fit(train_loader, val_loader, epochs=2)
    assert os.path.isdir(os.path.join(trainer.run_dir, "checkpoints", "swa"))
    # averaged weights load back for eval
    trainer2 = Trainer(cfg, log=lambda *_: None, eval_only=True)
    trainer2.state = restore_weights(
        os.path.join(trainer.run_dir, "checkpoints", "swa"), trainer2.state
    )
    result = trainer2.validate(val_loader)
    assert np.isfinite(result["val_loss"])

    # BN recalibration really ran: the swa ckpt's batch_stats differ from the
    # last-epoch running stats (VERDICT r1 item 9) and are finite
    trainer3 = Trainer(cfg, log=lambda *_: None, eval_only=True)
    last_state = restore_weights(
        os.path.join(trainer.run_dir, "checkpoints", "last"), trainer3.state
    )
    import jax as _jax

    swa_leaves = _jax.tree_util.tree_leaves(trainer2.state.batch_stats)
    last_leaves = _jax.tree_util.tree_leaves(last_state.batch_stats)
    assert all(np.isfinite(np.asarray(l)).all() for l in swa_leaves)
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(swa_leaves, last_leaves))


def test_async_checkpoint_roundtrip(tmp_path):
    """cfg async_checkpoint: saves return without blocking on the disk
    commit; wait() drains, and the restored state is identical."""
    import jax
    import jax.numpy as jnp
    import optax

    from podtpu.train.state import TrainState
    from podtpu.train.trainer import CheckpointIO

    def mk_state(seed):
        k = jax.random.PRNGKey(seed)
        params = {"w": jax.random.normal(k, (8, 8)), "b": jnp.zeros((8,))}
        return TrainState.create(
            apply_fn=lambda *a, **kw: None, params=params,
            tx=optax.sgd(1e-3), batch_stats={"m": jnp.ones((8,))},
        )

    io = CheckpointIO(str(tmp_path / "ck"), async_save=True)
    state = mk_state(0).replace(step=7)
    io.save("last", state)
    io.save("best", state)  # waits for "last" internally, then overlaps
    io.wait()
    restored = io.restore(str(tmp_path / "ck" / "last"), mk_state(1))
    assert int(restored.step) == 7
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_fit_with_async_checkpoint(setup):
    """End-to-end fit with async_checkpoint: all checkpoints land and are
    restorable after fit returns (fit drains pending writes)."""
    cfg = dict(setup)
    cfg["async_checkpoint"] = True
    train_loader, val_loader = _loaders(cfg)
    trainer = Trainer(cfg, log=lambda *_: None)
    trainer.fit(train_loader, val_loader, epochs=2)
    ckpt_dir = os.path.join(trainer.run_dir, "checkpoints")
    for name in ("last", "best", "epoch_0000"):
        assert os.path.isdir(os.path.join(ckpt_dir, name))
    trainer2 = Trainer(cfg, log=lambda *_: None)
    trainer2.state = trainer2.ckpt.restore(
        os.path.join(ckpt_dir, "last"), trainer2.state)
    assert int(trainer2.state.step) == int(trainer.state.step) > 0


@pytest.mark.slow
def test_keep_checkpoints_retention(setup):
    """cfg keep_checkpoints: only the newest N periodic epoch_* checkpoints
    survive; last/best are never pruned."""
    cfg = dict(setup)
    cfg["keep_checkpoints"] = 1
    train_loader, val_loader = _loaders(cfg)
    trainer = Trainer(cfg, log=lambda *_: None)
    trainer.fit(train_loader, val_loader, epochs=3)
    ckpt_dir = os.path.join(trainer.run_dir, "checkpoints")
    epochs = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("epoch_"))
    assert epochs == ["epoch_0002"]
    assert os.path.isdir(os.path.join(ckpt_dir, "last"))
    assert os.path.isdir(os.path.join(ckpt_dir, "best"))


def test_async_overwrite_keeps_a_durable_checkpoint(tmp_path):
    """Overwriting 'last' must never delete the old committed checkpoint
    before the replacement is durable: the new save commits into
    last.staging and rename-swaps in, and a crash leftover (.staging with
    no swap) is resolved by restore()."""
    import jax
    import jax.numpy as jnp
    import optax

    from podtpu.train.state import TrainState
    from podtpu.train.trainer import CheckpointIO

    def mk_state(seed, step):
        k = jax.random.PRNGKey(seed)
        params = {"w": jax.random.normal(k, (8, 8)), "b": jnp.zeros((8,))}
        return TrainState.create(
            apply_fn=lambda *a, **kw: None, params=params,
            tx=optax.sgd(1e-3), batch_stats={"m": jnp.ones((8,))},
        ).replace(step=step)

    last = tmp_path / "ck" / "last"
    io = CheckpointIO(str(tmp_path / "ck"), async_save=True)
    io.save("last", mk_state(0, 1))
    io.wait()
    assert last.is_dir()

    # async overwrite: immediately after save() returns, the OLD committed
    # 'last' must still be on disk (the new one is only in .staging)
    io.save("last", mk_state(1, 2))
    assert last.is_dir(), "old checkpoint deleted before replacement durable"
    r = io.restore(str(last), mk_state(9, 0))  # wait()s, then finalizes
    assert int(r.step) == 2

    # crash between commit and swap: only .staging remains -> resolved
    os.rename(last, str(last) + ".staging")
    io2 = CheckpointIO(str(tmp_path / "ck"), async_save=True)
    r2 = io2.restore(str(last), mk_state(9, 0))
    assert int(r2.step) == 2


def test_prune_periodic_excludes_tmp_and_sorts_numerically(tmp_path):
    """Prune must skip orbax in-flight tmp dirs (an uncommitted async save
    is neither deleted nor counted as newest) and order by parsed epoch
    number (lexicographic inverts past epoch 9999)."""
    from podtpu.train.trainer import CheckpointIO

    io = CheckpointIO(str(tmp_path / "ck"))
    d = tmp_path / "ck"
    for name in ("epoch_0001", "epoch_9999", "epoch_10000",
                 "epoch_10000.orbax-checkpoint-tmp-123", "last", "best"):
        (d / name).mkdir()
    io.prune_periodic(1)
    left = set(os.listdir(d))
    assert "epoch_10000" in left            # numeric newest kept
    assert "epoch_9999" not in left and "epoch_0001" not in left
    assert "epoch_10000.orbax-checkpoint-tmp-123" in left  # in-flight safe
    assert {"last", "best"} <= left


@pytest.mark.slow
def test_sigterm_preemption_checkpoint(setup):
    """SIGTERM mid-training (the TPU-VM maintenance / scheduler-preemption
    signal) checkpoints `last` at the next step boundary and returns, so
    --resume continues the run; the handler is restored afterwards."""
    import signal
    import threading

    cfg = dict(setup)
    cfg["save_dir"] = cfg["save_dir"] + "/preempt"
    train_loader, val_loader = _loaders(cfg)
    trainer = Trainer(cfg, log=lambda *_: None)

    fired = threading.Event()

    def fire_when_training():
        # wait until at least one step has run, then deliver SIGTERM
        while int(trainer.state.step) < 1:
            fired.wait(0.2)
        os.kill(os.getpid(), signal.SIGTERM)

    before = signal.getsignal(signal.SIGTERM)
    t = threading.Thread(target=fire_when_training, daemon=True)
    t.start()
    history = trainer.fit(train_loader, val_loader, epochs=1000)
    t.join(5)

    assert len(history) < 1000  # stopped long before the horizon
    ckpt_dir = os.path.join(trainer.run_dir, "checkpoints")
    assert os.path.isdir(os.path.join(ckpt_dir, "last"))
    # the preemption checkpoint resumes at the step it saved
    trainer2 = Trainer(cfg, log=lambda *_: None)
    trainer2.state = trainer2.ckpt.restore(
        os.path.join(ckpt_dir, "last"), trainer2.state)
    assert int(trainer2.state.step) == int(trainer.state.step) > 0
    # fit restored the previous SIGTERM disposition on exit
    assert signal.getsignal(signal.SIGTERM) == before


def test_double_sigterm_escalates(tmp_path):
    """A second SIGTERM must kill the process immediately (default action):
    the graceful path only fires at a step boundary, which during the
    minutes-long initial compile may be far away — observed live: `timeout`
    SIGTERM-ing a compiling train.py leaked the process. Exercises the real
    handler (trainer.make_preempt_handler) in a subprocess."""
    import signal
    import subprocess
    import sys

    child = (
        "import os, signal, sys, threading, time\n"
        "sys.path.insert(0, %r)\n"
        "from podtpu.train.trainer import make_preempt_handler\n"
        "ev = threading.Event()\n"
        "signal.signal(signal.SIGTERM, make_preempt_handler(ev))\n"
        "print('READY', flush=True)\n"
        "while not ev.is_set():\n"
        "    time.sleep(0.05)\n"
        "print('FLAG', flush=True)\n"
        "time.sleep(60)\n"  # simulates being stuck in a long compile
        % REPO
    )
    p = subprocess.Popen([sys.executable, "-c", child],
                         stdout=subprocess.PIPE, text=True)
    try:
        assert p.stdout.readline().strip() == "READY"
        p.send_signal(signal.SIGTERM)  # graceful: flag only, stays alive
        assert p.stdout.readline().strip() == "FLAG"
        assert p.poll() is None
        p.send_signal(signal.SIGTERM)  # escalation: default-action exit
        rc = p.wait(timeout=10)
        assert rc == -signal.SIGTERM
    finally:
        if p.poll() is None:
            p.kill()


@pytest.mark.slow
def test_steps_per_dispatch_equivalence(setup, tmp_path):
    """cfg ``steps_per_dispatch: K`` (K optimizer steps scanned in one
    compiled dispatch — the measured +13.5% v4-tiny amortizer) must
    reproduce the single-step trainer: same per-epoch losses and final
    params, INCLUDING the ragged tail (3 batches/epoch at K=2 leaves one
    for the single-step fallback) and the EMA shadow under the scan."""
    from podtpu.data.synthetic import generate

    info = generate(str(tmp_path / "spd_data"), n_train=12, n_val=4,
                    size=96, num_classes=2, max_objects=2, seed=9)
    base = dict(setup)
    base.update(train_list=info["train_list"], val_list=info["val_list"],
                names=info["names"], ema=True, log_images=0,
                trainer_options={"check_val_every_n_epoch": 100})

    def run(spd, tag):
        cfg = dict(base)
        cfg["save_dir"] = str(tmp_path / f"runs_{tag}")
        if spd > 1:
            cfg["steps_per_dispatch"] = spd
        train_ds = YoloTxtDataset(cfg["train_list"], cfg["input_size"],
                                  True, "simple")
        val_ds = YoloTxtDataset(cfg["val_list"], cfg["input_size"],
                                False, "simple")
        mk = lambda ds, sh: Loader(ds, batch_size=4, shuffle=sh,
                                   max_annots=4, workers=2, seed=0)
        trainer = Trainer(cfg, log=lambda *_: None)
        history = trainer.fit(mk(train_ds, True), mk(val_ds, False),
                              epochs=1)
        return trainer, history

    # ONE epoch = 3 steps: a K=2 dispatch plus the ragged-tail fallback.
    # Longer trajectories are chaos-dominated (argmax assignment flips on
    # reassociation-level noise — CLAUDE.md trajectory-lockstep note), so
    # the comparison window stays short.
    t1, h1 = run(1, "spd1")
    t2, h2 = run(2, "spd2")
    assert t2.multi_step is not None
    assert int(t1.state.step) == int(t2.state.step) == 3
    # the scan-compiled program reassociates differently than the
    # single-step one: step-1 losses are bit-identical, step-2 differs at
    # 7.6e-6 (measured probe) — a semantic error (skipped step, wrong
    # batch order) is >>1%
    for a, b in zip(h1, h2):
        np.testing.assert_allclose(a["train_loss"], b["train_loss"],
                                   rtol=2e-3)
    import jax

    # measured drift after 2 scanned steps: 2.2e-4 max abs (probe); 2e-3
    # gives 10x margin while a wrong trajectory is percent-level
    for x, y in zip(jax.tree_util.tree_leaves(t1.state.params),
                    jax.tree_util.tree_leaves(t2.state.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=2e-3)
    for x, y in zip(jax.tree_util.tree_leaves(t1.state.ema),
                    jax.tree_util.tree_leaves(t2.state.ema)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   atol=2e-3)
