"""Train a detector from a YAML config.

CLI parity with the reference's ``train_yolov{1,2,3,4-tiny}.py`` scripts
(one generic entry keyed off ``cfg['model']``; thin per-version wrappers also
exist). Usage:

    python train.py --cfg configs/yolov3_voc.yaml [--resume CKPT] [--epochs N]
"""

from __future__ import annotations

import argparse

import jax

from podtpu.config import get_configs, setup_platform
from podtpu.data import Loader, build_datasets
from podtpu.train.trainer import Trainer
from podtpu.utils.summary import summarize


def train(cfg: dict, resume: str | None = None, epochs: int | None = None):
    train_ds, val_ds = build_datasets(cfg)
    host_id = jax.process_index()
    host_count = jax.process_count()
    train_loader = Loader(
        train_ds,
        batch_size=cfg["batch_size"] // host_count,
        shuffle=True,
        max_annots=cfg["max_annots"],
        workers=cfg["workers"],
        seed=cfg.get("seed", 0),
        host_id=host_id,
        host_count=host_count,
        worker_mode=cfg.get("worker_mode", "thread"),
    )
    val_loader = Loader(
        val_ds,
        batch_size=cfg["batch_size"] // host_count,
        shuffle=False,
        max_annots=cfg["max_annots"],
        workers=cfg["workers"],
        host_id=host_id,
        host_count=host_count,
    )
    trainer = Trainer(cfg)
    start_epoch = 0
    if resume:
        trainer.state = trainer.ckpt.restore(resume, trainer.state)
        # epoch-granular resume: a mid-epoch (preemption) checkpoint replays
        # its epoch from the start — set_epoch(epoch) keeps the data draws
        # per-epoch deterministic, and the step-indexed LR schedule realigns
        # within one epoch
        start_epoch = int(trainer.state.step) // max(len(train_loader), 1)
        print(f"resumed from {resume} at step {int(trainer.state.step)} "
              f"(epoch {start_epoch})")
    print(summarize(trainer.state.params, trainer.state.batch_stats))
    trainer.fit(train_loader, val_loader, epochs=epochs,
                start_epoch=start_epoch)
    return trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True, type=str, help="experiment yaml")
    ap.add_argument("--resume", type=str, default=None, help="checkpoint dir")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override cfg epochs")
    ap.add_argument("--platform", type=str, default=None,
                    help="pin JAX backend (e.g. cpu) for local runs")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: call jax.distributed.initialize() "
                         "(coordinator/process env vars per JAX docs); the "
                         "loader shards by process index automatically")
    args = ap.parse_args()
    setup_platform(args.platform)
    if args.distributed:
        jax.distributed.initialize()
    train(get_configs(args.cfg), resume=args.resume, epochs=args.epochs)


if __name__ == "__main__":
    main()
