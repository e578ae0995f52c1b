"""Training orchestration — the functional analog of the reference's
Lightning stack (pl.Trainer + callbacks, train_yolov3.py:50-74):

* per-step jitted DP train step (loss logged as ``train_loss``);
* validation every ``check_val_every_n_epoch`` epochs -> ``val_loss`` +
  ``val_mAP`` (module/yolov3_detector.py:33-47);
* orbax checkpoints: ``last`` every epoch, ``best`` on min val_loss,
  periodic every ``save_freq`` (ModelCheckpoint analog, train_yolov3.py:52-56);
* early stopping on val_loss with patience counted in validation rounds
  (EarlyStopping(patience=30), train_yolov3.py:57-61);
* TensorBoard scalars incl. the learning rate (LearningRateMonitor analog)
  under ``<save_dir>/<model>_<dataset>/version_N/`` — the reference's run
  directory scheme (utils/utility.py:13-14).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from podtpu.config import make_model_name
from podtpu.metrics import MeanAveragePrecision
from podtpu.parallel.mesh import make_mesh, shard_batch, shard_stacked_batch
from podtpu.train.optim import total_notfinite
from podtpu.train.schedule import build_schedule
from podtpu.train.state import TrainState, create_train_state, param_count
from podtpu.train.steps import (
    make_eval_step,
    make_multi_train_step,
    make_train_step,
)


def _local_rows(arr) -> np.ndarray:
    """Batch-sharded device array -> this host's rows as numpy.

    Single-process: the whole array. Multi-process DP: only this host's
    addressable shards (in batch order) — they line up with the host-local
    loader rows (``validate`` then all-gathers every host's rows so the
    logged val_mAP is the GLOBAL metric on every host; val_loss is already
    the global mean)."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards])


def make_run_dir(cfg: dict) -> str:
    base = os.path.join(cfg.get("save_dir", "./saved"), make_model_name(cfg))
    os.makedirs(base, exist_ok=True)
    n = 0
    while os.path.exists(os.path.join(base, f"version_{n}")):
        n += 1
    run = os.path.join(base, f"version_{n}")
    os.makedirs(os.path.join(run, "checkpoints"), exist_ok=True)
    return run


class CheckpointIO:
    """Orbax-backed save/restore of the train state's array pytree.

    ``async_save=True`` (cfg ``async_checkpoint``) overlaps the disk write
    with the next training epoch: orbax's StandardCheckpointer is an
    AsyncCheckpointer, whose ``save`` copies device arrays to host memory
    synchronously (so the train step may donate/overwrite the buffers
    immediately after) and commits to storage in a background thread. One
    checkpointer per target name ("last"/"best"/"swa"/periodic) lets the
    epoch's multiple saves all overlap — only an overwrite of the SAME
    target drains that target's pending commit first. ``wait`` drains all
    targets; it runs before any restore and at the end of ``Trainer.fit``.

    Overwrites of the named targets ("last"/"best"/"swa") are crash-safe:
    the new checkpoint commits into ``<name>.staging`` and is rename-swapped
    over the old one only once durable, so a kill at any point leaves at
    least one complete checkpoint on disk (``restore`` resolves
    ``.staging``/``.old`` leftovers, preferring the newest complete one).
    Without staging, orbax's ``force=True`` would delete the old directory
    before the new write — under async saves that no-durable-checkpoint
    window would span the whole overlapped epoch.
    """

    def __init__(self, ckpt_dir: str, async_save: bool = False):
        self._ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self._ckpt_dir, exist_ok=True)
        self._ckptrs: dict[str, object] = {}
        self._staged: set[str] = set()
        self._async = async_save

    def _path(self, name: str) -> str:
        return os.path.join(self._ckpt_dir, name)

    def _finalize(self, name: str):
        """Swap a committed ``<name>.staging`` into place (rename-based, so
        a crash at any point leaves a complete checkpoint under ``name``,
        ``name.staging``, or ``name.old`` — ``_resolve`` finds it)."""
        import shutil

        self._staged.discard(name)
        final = self._path(name)
        staging = final + ".staging"
        if not os.path.isdir(staging):
            return
        old = final + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(final):
            os.rename(final, old)
        os.rename(staging, final)
        shutil.rmtree(old, ignore_errors=True)

    @staticmethod
    def _resolve(path: str) -> str:
        """Resolve a named-target path against crash leftovers: a complete
        ``.staging`` is newer than the main dir; ``.old`` only exists if a
        swap died between its two renames (main dir absent)."""
        for candidate in (path + ".staging", path, path + ".old"):
            if os.path.isdir(candidate):
                return candidate
        return path

    def _ckptr_for(self, name: str):
        # periodic epoch_* saves share one checkpointer (distinct dirs, so
        # serializing consecutive periodic commits is harmless and the dict
        # stays bounded); the named targets each get their own
        import orbax.checkpoint as ocp

        key = name if name in ("last", "best", "swa") else "periodic"
        if key not in self._ckptrs:
            self._ckptrs[key] = ocp.StandardCheckpointer()
        return self._ckptrs[key]

    def wait(self):
        """Block until every pending async save has committed to disk, then
        swap committed staging saves into place."""
        for ckptr in self._ckptrs.values():
            ckptr.wait_until_finished()
        for name in list(self._staged):
            self._finalize(name)

    def save(self, name: str, state: TrainState):
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        if state.ema is not None:
            payload["ema"] = state.ema
        staged = name in ("last", "best", "swa")
        ckptr = self._ckptr_for(name)
        # a still-pending previous save of this target must finish before
        # its staging directory can be reused; other targets' pending
        # commits keep overlapping
        ckptr.wait_until_finished()
        if staged:
            self._finalize(name)  # previous commit becomes the durable dir
            ckptr.save(self._path(name) + ".staging", payload, force=True)
            self._staged.add(name)
        else:
            ckptr.save(self._path(name), payload, force=True)
        if not self._async:
            ckptr.wait_until_finished()
            if staged:
                self._finalize(name)

    def prune_periodic(self, keep: int):
        """Keep only the newest ``keep`` periodic ``epoch_<n>`` checkpoints
        (cfg ``keep_checkpoints``; ``last``/``best``/``swa`` are never
        pruned). Only fully committed directories are considered — orbax's
        in-flight ``*.orbax-checkpoint-tmp*`` directories are excluded, so
        a pending async commit is neither deleted nor counted as the newest
        (which would otherwise prune the last durable checkpoint before its
        replacement exists). Consequence under ``async_checkpoint``: up to
        ``keep + 1`` periodic directories exist transiently, until the
        in-flight newest commits. Newness is the parsed epoch number, not
        the name string (lexicographic order inverts past epoch 9999)."""
        import re
        import shutil

        if keep <= 0:
            return
        committed = []
        for d in os.listdir(self._ckpt_dir):
            m = re.fullmatch(r"epoch_(\d+)", d)
            if m and os.path.isdir(os.path.join(self._ckpt_dir, d)):
                committed.append((int(m.group(1)), d))
        for _, d in sorted(committed)[:-keep]:
            shutil.rmtree(os.path.join(self._ckpt_dir, d),
                          ignore_errors=True)

    def restore(self, path: str, state: TrainState) -> TrainState:
        """Restore arrays from ``path`` into the (freshly created) state.

        An ``ema``-enabled state restoring a pre-EMA checkpoint reseeds its
        shadow from the RESTORED weights (not the random init it was
        created with) — resume-with-newly-enabled-EMA starts the average
        from the restored model."""
        self.wait()
        payload = _restore_payload(
            self._ckptr_for("restore"),
            self._resolve(os.path.abspath(path)), state,
            with_ema=state.ema is not None)
        new = state.replace(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            opt_state=payload["opt_state"],
            step=payload["step"],
        )
        if state.ema is not None:
            from podtpu.train.state import init_ema

            new = (new.replace(ema=payload["ema"]) if "ema" in payload
                   else init_ema(new))
        return new


def make_preempt_handler(preempt):
    """SIGTERM handler for preemption-safe training (``save_on_signal``).

    First SIGTERM only sets the flag — the step loop saves a durable
    ``last`` checkpoint at the next step boundary and returns cleanly. A
    SECOND SIGTERM escalates to the default action (immediate exit): the
    boundary may be minutes away during the initial XLA compile, and
    schedulers (or plain ``timeout``) must still be able to kill the
    process with a repeat signal.
    """
    import signal

    def _on_sigterm(signum, frame):
        if preempt.is_set():
            signal.signal(signal.SIGTERM, signal.SIG_DFL)
            signal.raise_signal(signal.SIGTERM)
        preempt.set()

    return _on_sigterm


def _restore_payload(ckptr, resolved: str, state: TrainState,
                     with_ema: bool, require_ema: bool = False) -> dict:
    """Restore a train-state payload, tolerating checkpoints without the
    optional ``ema`` entry.

    ``with_ema`` first tries a template carrying the shadow subtree; if
    that fails, a retry WITHOUT it distinguishes "the checkpoint merely
    predates EMA" (fall back — or, with ``require_ema``, report the missing
    shadow) from "the checkpoint is broken/mismatched" (re-raise the
    original error)."""
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    shadow = {"params": state.params, "batch_stats": state.batch_stats}
    if not with_ema:
        try:
            return ckptr.restore(resolved, template)
        except Exception as err:
            # symmetric fallback: an EMA-trained checkpoint restoring into
            # a non-EMA config — retry with a shadow template and let the
            # caller ignore the extra entry
            template["ema"] = shadow
            try:
                return ckptr.restore(resolved, template)
            except Exception:
                raise err
    template["ema"] = state.ema if state.ema is not None else shadow
    try:
        return ckptr.restore(resolved, template)
    except Exception as err:
        template.pop("ema")
        try:
            payload = ckptr.restore(resolved, template)
        except Exception:
            raise err  # broken either way — report the real cause
        if require_ema:
            raise ValueError(
                f"--use-ema: checkpoint {resolved} carries no EMA shadow "
                "(was it trained with cfg `ema`?)") from None
        return payload


def restore_weights(path: str, state: TrainState,
                    use_ema: bool = False) -> TrainState:
    """Weights-only restore (params + batch_stats) for eval/inference.

    ``use_ema=True`` loads the checkpoint's EMA shadow as the weights —
    the reference ``strip_optimizer``'s ``x['model'] = x['ema']`` step
    (utils/general.py:735-744). The checkpoint must have been trained with
    cfg ``ema``."""
    import orbax.checkpoint as ocp

    payload = _restore_payload(
        ocp.StandardCheckpointer(),
        CheckpointIO._resolve(os.path.abspath(path)), state,
        with_ema=state.ema is not None or use_ema, require_ema=use_ema)
    src = payload["ema"] if use_ema else payload
    # weights-only semantics: the returned state carries ONLY the chosen
    # weights — dropping the (stale, freshly-initialized) shadow also stops
    # Trainer._eval_state from re-swapping it over the restored weights
    return state.replace(
        params=src["params"], batch_stats=src["batch_stats"], ema=None
    )


def restore_eval_weights(path: str, state: TrainState, cfg: dict,
                         use_ema: bool | None = None) -> TrainState:
    """CLI-facing restore: pick the weights evaluation should see.

    ``use_ema=None`` (auto) mirrors the Trainer: when cfg ``ema.eval`` is
    on (the default for ``ema``-enabled configs), the EMA shadow is what
    validation scored and ``best`` was selected on, so eval/inference CLIs
    load it too — ``test.py --ckpt best`` then reproduces the logged val
    numbers. Auto falls back to the raw weights when the checkpoint
    predates EMA; an explicit ``use_ema=True`` fails instead."""
    auto = use_ema is None
    if auto:
        from podtpu.train.state import ema_options

        eo = ema_options(cfg)
        use_ema = bool(eo and eo["eval"] and state.ema is not None)
    try:
        return restore_weights(path, state, use_ema=use_ema)
    except ValueError:
        if not auto:
            raise
        return restore_weights(path, state, use_ema=False)


class Trainer:
    def __init__(self, cfg: dict, run_dir: str | None = None,
                 log: Callable[[str], None] = print, use_mesh: bool = True,
                 eval_only: bool = False):
        self.cfg = cfg
        self.log = log
        self.mesh = self._pick_mesh(cfg) if use_mesh else None
        rng = jax.random.PRNGKey(cfg.get("seed", 0))
        self.rng = rng
        self.state = create_train_state(cfg, rng)
        self.state_shardings = None
        if self.mesh is not None:
            from podtpu.parallel.mesh import state_shardings

            popts = cfg.get("parallel_options") or {}
            self.state_shardings = state_shardings(
                self.mesh, self.state, fsdp=bool(popts.get("fsdp")),
                tensor=int(popts.get("tensor", 1)) > 1,
            )
            self.state = jax.device_put(self.state, self.state_shardings)
        self.train_step = make_train_step(
            cfg, self.mesh, state_shardings=self.state_shardings)
        # cfg ``steps_per_dispatch: K`` — scan K optimizer steps in one
        # compiled dispatch (measured +13.5% on yolov4-tiny@416 b128 where
        # the per-step dispatch gap was 25%; neutral on yolov3 — see
        # steps.py::make_multi_train_step). Ragged epoch tails fall back to
        # the single-step program.
        self._spd = max(1, int(cfg.get("steps_per_dispatch", 1)))
        self.multi_step = (
            make_multi_train_step(cfg, self.mesh,
                                  state_shardings=self.state_shardings)
            if self._spd > 1 and not eval_only else None)
        # eval runs on a shadow-less state (``_eval_state`` strips ``ema`` —
        # restored eval states drop it too), so its sharding tree must not
        # carry the shadow's subtree either
        self.eval_shardings = (
            None if self.state_shardings is None
            else self.state_shardings.replace(ema=None))
        self.eval_step = make_eval_step(
            cfg, self.mesh, state_shardings=self.eval_shardings)
        self.schedule = build_schedule(cfg)
        # with gradient accumulation the optimizer advances its schedule
        # once per k micro-steps; log the lr actually applied
        from podtpu.train.optim import accum_steps

        self._accum = accum_steps(cfg)
        from podtpu.train.state import ema_options

        eopts = ema_options(cfg)
        self._ema_eval = bool(eopts and eopts["eval"])
        self.map_metric = MeanAveragePrecision(
            cfg["num_classes"], cfg["input_size"]
        )
        # eval-only consumers (test/inference/export CLIs) don't create
        # run directories or checkpoint writers
        self.run_dir = None if eval_only else (run_dir or make_run_dir(cfg))
        self.ckpt = (None if eval_only else
                     CheckpointIO(os.path.join(self.run_dir, "checkpoints"),
                                  async_save=bool(
                                      cfg.get("async_checkpoint", False))))
        self._writer = None
        self.history: list[dict] = []
        self.log(
            f"model={cfg['model']} params={param_count(self.state.params):,}"
            + (f" run_dir={self.run_dir}" if self.run_dir else "")
        )

    @staticmethod
    def _pick_mesh(cfg):
        """Mesh over the most devices that fit the batch and model factors.

        ``parallel_options.spatial = k`` groups k chips per image (height
        partitioning); ``parallel_options.tensor = k`` groups k chips per
        layer (channel partitioning); the data axis then only needs to
        divide batch by n_devices/(spatial*tensor)."""
        devices = jax.devices()
        batch = int(cfg.get("batch_size", 1))
        popts = cfg.get("parallel_options") or {}
        spatial = int(popts.get("spatial", 1))
        tensor = int(popts.get("tensor", 1))
        groups = max(spatial, 1) * max(tensor, 1)
        if groups > 1 and len(devices) % groups != 0:
            raise ValueError(
                f"parallel_options spatial={spatial} x tensor={tensor} does "
                f"not divide {len(devices)} devices")
        n = len(devices)
        while n > groups and (n % groups != 0
                              or batch % (n // groups) != 0):
            n -= 1
        return make_mesh(devices[:n], spatial=spatial, tensor=tensor)

    @property
    def writer(self):
        if self._writer is None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(self.run_dir)
            except Exception:  # tensorboard unavailable -> no-op writer
                class _Null:
                    def add_scalar(self, *a, **k):
                        pass

                    def add_image(self, *a, **k):
                        pass

                    def flush(self):
                        pass

                self._writer = _Null()
        return self._writer

    def _put(self, batch: dict) -> dict:
        if self.mesh is not None:
            return shard_batch(batch, self.mesh)
        return jax.tree_util.tree_map(jnp.asarray, batch)

    def fit(self, train_loader, val_loader, epochs: int | None = None,
            start_epoch: int = 0):
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg["epochs"]
        val_every = int(cfg.get("trainer_options", {}).get(
            "check_val_every_n_epoch", 1))
        patience = int(cfg.get("early_stopping_patience", 30))
        save_freq = int(cfg.get("save_freq", 5))

        # SWA (the reference's commented experimental callback,
        # configs/yolov3_voc.yaml:73-75): average params over epochs from
        # ``swa: {start_epoch: N}``; averaged weights saved as ckpt "swa".
        swa_cfg = cfg.get("swa") or {}
        swa_start = int(swa_cfg.get("start_epoch", -1)) if swa_cfg else -1
        swa_params = None
        swa_count = 0

        best_val = float("inf")
        bad_rounds = 0
        t_start = time.time()

        # Preemption-safe training (cfg ``save_on_signal``, default on):
        # SIGTERM — what TPU-VM maintenance events and cluster schedulers
        # deliver — requests a graceful stop. The handler only sets a flag;
        # the step loop notices it at the next step boundary, saves a
        # durable ``last`` checkpoint, and returns normally, so
        # ``train.py --resume <run>/checkpoints/last`` continues the run.
        import signal
        import threading

        preempt = threading.Event()
        prev_handler, installed = None, False
        if bool(cfg.get("save_on_signal", True)):
            try:
                prev_handler = signal.signal(
                    signal.SIGTERM, make_preempt_handler(preempt))
                installed = True
            except ValueError:  # not the main thread - no handler, no flag
                pass
        # Lightning-style in-epoch progress line (opt-out: progress: false);
        # only when stdout is a tty so logs/CI stay clean
        progress = bool(cfg.get("progress", True)) and sys.stdout.isatty()
        steps_per_epoch = len(train_loader)

        try:
            for epoch in range(start_epoch, epochs):
                train_loader.set_epoch(epoch)
                losses = []
                t_epoch = time.time()
                n_images = 0
                pending = []  # host batches buffered for one K-step dispatch
                for i, batch in enumerate(train_loader):
                    n_images += batch.pop("n_valid", batch["img"].shape[0])
                    if self.multi_step is not None:
                        pending.append(batch)
                        if len(pending) < self._spd:
                            continue
                        stacked = {k: np.stack([b[k] for b in pending])
                                   for k in pending[0]}
                        pending = []
                        stacked = (shard_stacked_batch(stacked, self.mesh)
                                   if self.mesh is not None else
                                   jax.tree_util.tree_map(jnp.asarray,
                                                          stacked))
                        self.state, metrics = self.multi_step(
                            self.state, stacked, self.rng)
                        losses.extend(metrics["loss"][k]
                                      for k in range(self._spd))
                    else:
                        batch = self._put(batch)
                        self.state, metrics = self.train_step(
                            self.state, batch, self.rng
                        )
                        losses.append(metrics["loss"])
                    if preempt.is_set():
                        break
                    if progress and (i % 10 == 9 or i + 1 == steps_per_epoch):
                        # float() syncs on the ready-by-now previous loss only
                        rate = n_images / max(time.time() - t_epoch, 1e-9)
                        sys.stdout.write(
                            f"\repoch {epoch}: {i + 1}/{steps_per_epoch} "
                            f"loss={float(losses[-1]):.4g} {rate:.1f} img/s   ")
                        sys.stdout.flush()
                # ragged tail (< K batches left, or a preempt mid-group):
                # run through the single-step program so no sample is lost
                for batch in pending:
                    batch = self._put(batch)
                    self.state, metrics = self.train_step(
                        self.state, batch, self.rng)
                    losses.append(metrics["loss"])
                if progress:
                    sys.stdout.write("\r\033[K")
                if preempt.is_set():
                    self.ckpt.save("last", self.state)
                    self.log(f"SIGTERM: saved preemption checkpoint 'last' at "
                             f"step {int(self.state.step)}; stopping "
                             f"(resume with --resume .../checkpoints/last)")
                    break
                if not losses:
                    raise RuntimeError("empty train loader")
                train_loss = float(jnp.mean(jnp.stack(losses)))
                step = int(self.state.step)
                lr = float(self.schedule(step // self._accum))
                dt = time.time() - t_epoch
                ips = n_images / dt if dt > 0 else 0.0
                self.writer.add_scalar("train_loss", train_loss, step)
                self.writer.add_scalar("lr", lr, step)
                self.writer.add_scalar("images_per_sec", ips, step)
                row = {"epoch": epoch, "step": step, "train_loss": train_loss,
                       "lr": lr, "images_per_sec": ips}
                skipped = total_notfinite(self.state.opt_state)
                if skipped is not None:
                    self.writer.add_scalar("skipped_nonfinite_updates", skipped,
                                           step)
                    row["skipped_updates"] = skipped
                    if skipped:
                        self.log(f"WARNING: {skipped} non-finite update(s) "
                                 "dropped so far (optimizer_options."
                                 "skip_nonfinite guard)")

                if (epoch + 1) % val_every == 0:
                    val = self.validate(val_loader)
                    row.update(val)
                    n_img = int(cfg.get("log_images", 0))
                    if n_img:
                        self._log_val_images(val_loader, n_img, step)
                    self.writer.add_scalar("val_loss", val["val_loss"], step)
                    self.writer.add_scalar("val_mAP", val["val_mAP"], step)
                    # per-class AP scalars (ROADMAP polish: AP breakdown in TB);
                    # result_per_class rows are [AP, TP, FP, FN]
                    for name, row_c in zip(self._class_names(),
                                           self.map_metric.result_per_class()):
                        self.writer.add_scalar(f"val_AP/{name}", float(row_c[0]),
                                               step)
                    if val["val_loss"] < best_val:
                        best_val = val["val_loss"]
                        bad_rounds = 0
                        self.ckpt.save("best", self.state)
                    else:
                        bad_rounds += 1

                if swa_start >= 0 and epoch >= swa_start:
                    swa_count += 1
                    if swa_params is None:
                        # copy: the donated train step would invalidate aliased
                        # buffers on the next epoch
                        swa_params = jax.tree_util.tree_map(
                            jnp.copy, self.state.params
                        )
                    else:
                        w = 1.0 / swa_count
                        swa_params = jax.tree_util.tree_map(
                            lambda avg, p: avg + (p - avg) * w,
                            swa_params, self.state.params,
                        )

                self.ckpt.save("last", self.state)
                if (epoch + 1) % save_freq == 0:
                    self.ckpt.save(f"epoch_{epoch:04d}", self.state)
                    self.ckpt.prune_periodic(int(cfg.get("keep_checkpoints", 0)))

                self.history.append(row)
                self.log(
                    f"epoch {epoch}: " + " ".join(
                        f"{k}={v:.5g}" for k, v in row.items() if k != "epoch"
                    )
                )
                if bad_rounds >= patience:
                    self.log(f"early stopping after {bad_rounds} stale rounds")
                    break
        finally:
            if installed:
                signal.signal(
                    signal.SIGTERM,
                    prev_handler if prev_handler is not None
                    else signal.SIG_DFL)
        if swa_params is not None:
            swa_state = self.state.replace(params=swa_params)
            # averaged weights shift every layer's activation distribution,
            # so recalibrate BN statistics with a forward-only sweep over the
            # train loader (torch.optim.swa_utils.update_bn role)
            n_recal = int(swa_cfg.get("bn_recal_batches", 20))
            swa_state = self.recalibrate_bn(swa_state, train_loader, n_recal)
            self.ckpt.save("swa", swa_state)
            self.log(f"saved SWA weights (averaged over {swa_count} epochs, "
                     f"BN recalibrated over {n_recal} batches)")
        self.ckpt.wait()  # drain any pending async checkpoint write
        self.writer.flush()
        self.log(f"fit done in {time.time() - t_start:.1f}s")
        return self.history

    def _log_val_images(self, val_loader, n_img: int, step: int):
        """Tagged-detection images to TensorBoard: GT red, predictions green
        (the reference's inference window, inference_yolov3.py:86-90, as TB
        panels). Opt-in via cfg ``log_images: N``."""
        from podtpu.utils.viz import annots_to_boxes, draw_boxes

        names = self._class_names()
        size = self.cfg["input_size"]
        val_loader.set_epoch(0)
        batch = next(iter(val_loader))
        batch.pop("n_valid", None)
        _, dets, valid = self.eval_step(self._eval_state(), self._put(batch))
        dets = _local_rows(dets)
        valid = _local_rows(valid)
        imgs = np.asarray(batch["img"][:n_img])
        if imgs.dtype != np.uint8:
            imgs = (imgs * 255).astype(np.uint8)
        for i in range(min(n_img, imgs.shape[0])):
            img = np.ascontiguousarray(imgs[i])
            img = draw_boxes(img, annots_to_boxes(batch["annot"][i], size),
                             names, color=(255, 0, 0))
            img = draw_boxes(img, dets[i][valid[i]], names,
                             color=(0, 255, 0))
            self.writer.add_image(f"val_detections/{i}", img, step,
                                  dataformats="HWC")

    def _class_names(self) -> list[str]:
        names_path = self.cfg.get("names")
        n = self.cfg["num_classes"]
        try:
            with open(names_path) as f:
                names = [l.strip() for l in f if l.strip()]
            if len(names) >= n:
                return names[:n]
        except (TypeError, OSError):
            pass
        return [f"class{i}" for i in range(n)]

    def recalibrate_bn(self, state: TrainState, loader,
                       num_batches: int = 20) -> TrainState:
        """Replace ``state``'s batch_stats with the cumulative average of raw
        batch statistics over ``num_batches`` train batches (the SWA
        ``update_bn`` pass — forward only, no gradient)."""
        from podtpu.train.steps import make_stats_step

        stats_step = make_stats_step(self.cfg, self.mesh,
                                     state_shardings=self.eval_shardings)
        if state.ema is not None:
            state = state.replace(ema=None)
        loader.set_epoch(0)
        acc = None
        n = 0
        for batch in loader:
            if n >= num_batches:
                break
            batch.pop("n_valid", None)
            raw = stats_step(state, self._put(batch), self.rng)
            n += 1
            if acc is None:
                acc = raw
            else:
                w = 1.0 / n
                acc = jax.tree_util.tree_map(
                    lambda a, r: a + (r - a) * w, acc, raw)
        if acc is None:
            return state
        return state.replace(batch_stats=acc)

    def _eval_state(self) -> TrainState:
        """The state evaluation runs on: the EMA shadow's weights when cfg
        ``ema.eval`` (YOLOv5-style — val/best-selection see the averaged
        model), else the raw training weights."""
        if self._ema_eval and self.state.ema is not None:
            return self.state.replace(
                params=self.state.ema["params"],
                batch_stats=self.state.ema["batch_stats"], ema=None)
        return (self.state if self.state.ema is None
                else self.state.replace(ema=None))

    def validate(self, val_loader) -> dict:
        """val_loss + val_mAP over the full validation set.

        Multi-process DP: each host's loader holds one shard, the eval step
        runs on the global batch, and the per-host detection/annotation
        rows are all-gathered so EVERY host scores the GLOBAL mAP (the
        loaders' equalized shards keep batch counts — and therefore the
        collective schedule — identical across hosts)."""
        self.map_metric.reset_states()
        losses = []
        val_loader.set_epoch(0)
        eval_state = self._eval_state()
        multihost = jax.process_count() > 1
        for batch in val_loader:
            n_valid = batch.pop("n_valid", batch["img"].shape[0])
            dev_batch = self._put(batch)
            loss, dets, valid = self.eval_step(eval_state, dev_batch)
            losses.append(float(loss))
            # a padded final batch repeats its last sample — slice them off
            rows = (batch["annot"], _local_rows(dets), _local_rows(valid),
                    np.int64(n_valid))
            if multihost:
                from jax.experimental import multihost_utils

                ann_g, det_g, val_g, nv_g = (
                    multihost_utils.process_allgather(r) for r in rows)
                for h in range(ann_g.shape[0]):
                    nv = int(nv_g[h])
                    self.map_metric.update_state(
                        ann_g[h][:nv], det_g[h][:nv], val_g[h][:nv])
            else:
                ann, det, val, nv = rows
                self.map_metric.update_state(ann[:nv], det[:nv], val[:nv])
        val_loss = float(np.mean(losses)) if losses else float("nan")
        val_map = self.map_metric.result()
        return {"val_loss": val_loss, "val_mAP": val_map}
