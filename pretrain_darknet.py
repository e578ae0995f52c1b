"""Pretrain Darknet-19 as a classifier (the reference's tiny-imagenet
backbone pretraining that produces ``ckpt/darknet19-tiny-imagenet.ckpt``,
models/backbone/darknet.py:96-150).

Dataset: a directory of per-class subdirectories of images (imagefolder
layout). The resulting weights ``.npz`` plugs into any detector config via
``backbone_pretrained: path/to/weights.npz`` — the classifier and the
detectors share the ``backbone`` parameter scope, so the partial load maps
1:1.

    python pretrain_darknet.py --data /path/to/tiny-imagenet/train \
        --epochs 10 --out darknet19_pretrained.npz [--platform cpu]

``--model cspdarknet53`` pretrains the full-YOLOv4 backbone the same way
(CSPDarknet53Classifier shares the ``backbone`` scope with YoloV4).
"""

from __future__ import annotations

import argparse
import os
import time

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import optax

from podtpu.config import setup_platform
from podtpu.models.darknet import Darknet19Classifier


class ImageFolderDataset:
    def __init__(self, root: str, size: int):
        self.size = size
        self.classes = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )
        self.samples: list[tuple[str, int]] = []
        for idx, cls in enumerate(self.classes):
            cdir = os.path.join(root, cls)
            for name in sorted(os.listdir(cdir)):
                if name.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")):
                    self.samples.append((os.path.join(cdir, name), idx))

    def __len__(self):
        return len(self.samples)

    def get(self, index: int, seed: int, augment: bool = True):
        rng = np.random.default_rng(seed)
        path, label = self.samples[index]
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        img = cv2.resize(img, (self.size, self.size))
        if augment and rng.random() < 0.5:
            img = np.ascontiguousarray(img[:, ::-1])
        return img.astype(np.float32) / 255.0, label


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True, type=str)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--out", type=str, default="darknet19_pretrained.npz")
    ap.add_argument("--model", type=str, default="darknet19",
                    choices=["darknet19", "cspdarknet53"])
    ap.add_argument("--val-data", type=str, default=None,
                    help="imagefolder val split; top-1 evaluated per epoch")
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    setup_platform(args.platform)

    ds = ImageFolderDataset(args.data, args.size)
    num_classes = len(ds.classes)
    print(f"{len(ds)} images / {num_classes} classes")
    val_ds = ImageFolderDataset(args.val_data, args.size) if args.val_data else None
    if val_ds is not None:
        assert val_ds.classes == ds.classes, "train/val class sets differ"

    if args.model == "cspdarknet53":
        from podtpu.models.yolov4 import CSPDarknet53Classifier

        model = CSPDarknet53Classifier(num_classes=num_classes,
                                       dtype=jnp.bfloat16)
    else:
        model = Darknet19Classifier(num_classes=num_classes,
                                    dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        rng, jnp.zeros((1, args.size, args.size, 3)), train=False
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    steps_per_epoch = len(ds) // args.batch
    schedule = optax.cosine_decay_schedule(
        args.lr, args.epochs * max(1, steps_per_epoch)
    )
    tx = optax.sgd(schedule, momentum=0.9, nesterov=True)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, imgs, labels, rng):
        def loss_fn(p):
            logits, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                imgs, train=True, mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            acc = (jnp.argmax(logits, -1) == labels).mean()
            return loss, (updates, acc)

        (loss, (updates, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, updates["batch_stats"], opt_state, loss, acc

    @jax.jit
    def eval_step(params, batch_stats, imgs, labels):
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             imgs, train=False)
        return (jnp.argmax(logits, -1) == labels).sum()

    def evaluate(params, batch_stats) -> float:
        """Top-1 over the val imagefolder (full fixed-size batches; the
        ragged tail is dropped so one compiled program covers every chunk)."""
        vb = min(args.batch, len(val_ds))
        correct = total = 0
        for b in range(len(val_ds) // vb):
            samples = [val_ds.get(i, seed=0, augment=False)
                       for i in range(b * vb, (b + 1) * vb)]
            imgs = jnp.asarray(np.stack([s[0] for s in samples]))
            labels = jnp.asarray(np.array([s[1] for s in samples]))
            correct += int(eval_step(params, batch_stats, imgs, labels))
            total += vb
        return correct / max(1, total)

    order_rng = np.random.default_rng(0)
    for epoch in range(args.epochs):
        order = order_rng.permutation(len(ds))
        t0 = time.time()
        losses, accs = [], []
        for b in range(steps_per_epoch):
            idx = order[b * args.batch:(b + 1) * args.batch]
            samples = [ds.get(int(i), int(i) + epoch * 1_000_003) for i in idx]
            imgs = jnp.asarray(np.stack([s[0] for s in samples]))
            labels = jnp.asarray(np.array([s[1] for s in samples]))
            params, batch_stats, opt_state, loss, acc = step(
                params, batch_stats, opt_state, imgs, labels,
                jax.random.fold_in(rng, epoch * steps_per_epoch + b),
            )
            losses.append(float(loss))
            accs.append(float(acc))
        val_msg = ""
        if val_ds is not None:
            val_msg = f" val_top1={evaluate(params, batch_stats):.4f}"
        print(f"epoch {epoch}: loss={np.mean(losses):.4f} "
              f"acc={np.mean(accs):.4f}{val_msg} ({time.time() - t0:.1f}s)",
              flush=True)

    # save flat npz compatible with detector partial-load (shared
    # 'backbone' scope)
    from podtpu.export.weights import SEP, _flatten

    arrays = {}
    arrays.update(_flatten(params, "params" + SEP))
    arrays.update(_flatten(batch_stats, "batch_stats" + SEP))
    np.savez(args.out, **arrays)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
