"""Structured-pruning latency experiment (pruning_test.py:34-60 analog).

Zeroes the lowest-L2 fraction of output channels in every darknet19 conv
kernel (the effect of torch's ``ln_structured(amount=0.5, n=2, dim=0)``)
and A/B-times the forward pass. On XLA, zeroed channels don't speed up the
dense conv — the measurement shows exactly that (the reference's experiment
has the same property on cuDNN); the artifact is the sparsified weight set
a slimming pass could consume.

    python pruning_test.py [--amount 0.5] [--iters 20]
"""

from __future__ import annotations

import argparse
import time

from podtpu.config import setup_platform

import jax
import jax.numpy as jnp
import numpy as np

from podtpu.models import Darknet19


def prune_channels(params, amount: float):
    """Zero the ``amount`` fraction of output channels with smallest L2 norm
    in every conv kernel (HWIO: norm over H, W, I per O channel)."""

    def prune(path, leaf):
        key = getattr(path[-1], "key", None)
        if key == "kernel" and leaf.ndim == 4:
            norms = jnp.sqrt(jnp.sum(leaf.astype(jnp.float32) ** 2, axis=(0, 1, 2)))
            k = int(leaf.shape[-1] * amount)
            if k == 0:
                return leaf
            threshold = jnp.sort(norms)[k - 1]
            keep = (norms > threshold).astype(leaf.dtype)
            return leaf * keep[None, None, None, :]
        return leaf

    return jax.tree_util.tree_map_with_path(prune, params)


def time_forward(model, variables, x, iters: int) -> float:
    fn = jax.jit(lambda v, x: model.apply(v, x, train=False))

    def sync(o):
        # single-element device_get: block_until_ready alone returns early
        # over the remote-TPU tunnel, and fetching the full heads would ship
        # MBs through it (see perf_probe.py::timeit)
        jax.device_get(jnp.ravel(jax.tree_util.tree_leaves(o)[0])[0])

    out = fn(variables, x)
    sync(out)
    t0 = time.perf_counter()
    # perturb the input each iteration: the axon terminal memoizes identical
    # dispatches (same program + same buffers never touch the chip)
    for k in range(iters):
        out = fn(variables, x + k * 1e-6)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--amount", type=float, default=0.5)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--platform", type=str, default=None,
                    help="pin JAX backend (e.g. cpu) for local runs")
    args = ap.parse_args()
    setup_platform(args.platform)

    model = Darknet19(out_indices=(5,))
    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, args.size, args.size, 3)),
        jnp.float32,
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    t_dense = time_forward(model, variables, x, args.iters)
    pruned = dict(variables)
    pruned["params"] = prune_channels(variables["params"], args.amount)
    zero_frac = float(
        np.mean([
            (np.asarray(l) == 0).mean()
            for l in jax.tree_util.tree_leaves(pruned["params"])
        ])
    )
    t_pruned = time_forward(model, pruned, x, args.iters)
    print(f"dense:  {1000 * t_dense:.2f} ms/img")
    print(f"pruned: {1000 * t_pruned:.2f} ms/img "
          f"(~{100 * zero_frac:.0f}% zeros; dense compute — no speedup expected "
          f"without a slimming pass)")


if __name__ == "__main__":
    main()
