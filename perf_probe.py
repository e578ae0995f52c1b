"""Perf probe: break down where the YOLOv3-416 train step spends time on TPU.

Measures forward-only, forward+loss, full train step, and the eval path
(forward+decode+NMS) at several batch sizes, printing images/sec/chip for
each. Run on the real chip after freeing it (this is a tuning tool, not the
driver benchmark — that's bench.py).

    python perf_probe.py [--batches 32 64 128] [--platform cpu]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from podtpu.config import setup_platform


def timeit(fn, make_args, iters=10, warmup=3):
    """``make_args(eps) -> args tuple``: each timed call gets a perturbed
    input — the axon terminal memoizes identical dispatches (same program +
    same buffers never touch the chip), so re-timing fixed args measures
    dispatch overhead, not execution. The per-call elementwise add costs
    well under 1% of any step measured here."""
    def sync(o):
        # force a real round trip: block_until_ready alone has been observed
        # returning early over the remote-TPU tunnel (exported_inference.py).
        # Fetch ONE element, not the outputs — device_get of a batch-128
        # train state or head tensors ships ~100 MB through the tunnel and
        # would dominate the measurement. The single-element slice can only
        # answer after its producer finished, and the TPU core executes
        # in-order, so it fences the whole timed chain.
        leaf = jax.tree_util.tree_leaves(o)[0]
        jax.device_get(jnp.ravel(leaf)[0])

    out = None
    for _ in range(warmup):
        out = fn(*make_args(0.0))
    sync(out)
    t0 = time.perf_counter()
    for k in range(1, iters + 1):
        out = fn(*make_args(k * 1e-6))
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[32, 64, 128])
    ap.add_argument("--platform", type=str, default=None)
    args = ap.parse_args()
    setup_platform(args.platform)

    from __graft_entry__ import _flagship_cfg
    from podtpu.losses import build_loss
    from podtpu.models import build_model
    from podtpu.train.state import create_train_state
    from podtpu.train.steps import make_eval_step, make_train_step

    cfg = _flagship_cfg()
    model = build_model(cfg)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    loss_fn = build_loss(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    r = np.random.default_rng(0)
    for batch_size in args.batches:
        imgs = jnp.asarray(
            r.uniform(0, 1, (batch_size, 416, 416, 3)).astype(np.float32)
        )
        annot = -np.ones((batch_size, cfg["max_annots"], 5), np.float32)
        annot[:, :8, :4] = r.uniform(0.2, 0.6, (batch_size, 8, 4))
        annot[:, :8, 4] = r.integers(0, 20, (batch_size, 8))
        annot_j = jnp.asarray(annot)

        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        fwd_loss = jax.jit(
            lambda v, x, a: loss_fn(model.apply(v, x, train=False), a)
        )
        train_step = make_train_step(cfg, mesh=None, donate=False)
        eval_step = make_eval_step(cfg, mesh=None)
        rng = jax.random.PRNGKey(0)

        try:
            t_fwd = timeit(fwd, lambda e: (variables, imgs + e))
            t_fl = timeit(fwd_loss, lambda e: (variables, imgs + e, annot_j))
            t_train = timeit(
                train_step,
                lambda e: (state, {"img": imgs + e, "annot": annot_j}, rng),
                iters=8)
            t_eval = timeit(
                eval_step,
                lambda e: (state, {"img": imgs + e, "annot": annot_j}))
        except Exception as exc:  # OOM at large batches
            print(f"B={batch_size}: {type(exc).__name__}: {str(exc)[:120]}")
            continue

        def ips(t):
            return batch_size / t

        print(
            f"B={batch_size:4d}  fwd {ips(t_fwd):7.1f} img/s | "
            f"fwd+loss {ips(t_fl):7.1f} | train {ips(t_train):7.1f} | "
            f"eval(decode+nms) {ips(t_eval):7.1f}"
        )


if __name__ == "__main__":
    main()
