"""Train-step throughput probe for any model family on the attached chip.

    python tools/bench_family.py --cfg configs/yolov4_voc.yaml --batches 16,32,48

Same methodology as bench.py (full jitted train step, device-resident
synthetic batches, donated state chaining across iterations so the axon
terminal's dispatch memoization cannot short-circuit the timing).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_inputs(cfg: dict, batch: int, hb=None):
    """Replicated device state + synthetic device-resident batch.

    The ONE input-construction path shared by the traced bench below and
    the AOT capture (tools/bench_aot.py), so both time the same program on
    identical data by construction, not by copy-paste."""
    from podtpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
    from podtpu.train.state import create_train_state

    hb = hb or (lambda msg: None)
    mesh = make_mesh()
    rng = jax.random.PRNGKey(0)
    # create_train_state jits its array-producing init (one dispatch, not
    # ~70 eager tunnel round trips — ~131 s measured in the round-3 harness)
    state = create_train_state(cfg, rng)
    state = jax.device_put(state, replicated_sharding(mesh))
    hb("state_ready: params initialized on device")

    size = cfg["input_size"]
    # images are generated ON DEVICE — a batch-128 f32 416^2 batch is
    # ~266 MB, minutes through the tunnel if shipped from host
    imgs = jax.jit(lambda k: jax.random.uniform(
        k, (batch, size, size, 3), jnp.float32))(jax.random.PRNGKey(1))
    r = np.random.default_rng(0)
    annot = -np.ones((batch, cfg["max_annots"], 5), np.float32)
    for b in range(batch):
        for i in range(min(8, cfg["max_annots"])):
            cx, cy = r.uniform(0.1, 0.9, 2)
            w, h = r.uniform(0.05, 0.4, 2)
            annot[b, i] = [cx, cy, w, h, r.integers(0, cfg["num_classes"])]
    dbatch = shard_batch({"img": imgs, "annot": annot}, mesh)
    return mesh, state, dbatch, rng


def bench(cfg: dict, batch: int, warmup: int = 3, iters: int = 10,
          hb=None, ksteps: int = 1) -> float:
    """``ksteps > 1``: wrap K train steps in ONE dispatched program (a
    ``lax.scan`` over the step, carrying the donated state) — the dispatch/
    tunnel amortizer for small models. roofline_budget measured yolov4-tiny
    at 44.6 ms device vs 59.5 ms bench wall (~25% per-step dispatch gap,
    commit 542bb22); the earlier "K-step loop neutral" ledger entry was
    yolov3-only (~10% gap; post-drift ~11% on v4-tiny too, RESULTS
    round-14). Throughput normalizes per underlying step."""
    from podtpu.train.steps import make_train_step

    hb = hb or (lambda msg: None)
    n_chips = len(jax.devices())
    mesh, state, dbatch, rng = build_inputs(cfg, batch, hb)

    if ksteps > 1:
        import functools

        from podtpu.train.steps import compiler_options

        inner = make_train_step(cfg, mesh, donate=False, jit=False)

        @functools.partial(jax.jit, donate_argnums=(0,),
                           compiler_options=compiler_options(cfg))
        def train_step(state, batch, rng):
            def body(st, _):
                st, m = inner(st, batch, rng)
                return st, m["loss"]
            st, losses = jax.lax.scan(body, state, None, length=ksteps)
            return st, {"loss": losses[-1]}
    else:
        train_step = make_train_step(cfg, mesh, donate=True)

    def fence(m):
        # real device round trip on ONE scalar: block_until_ready has been
        # observed returning early over the axon tunnel (CLAUDE.md); the
        # scalar exists only after the final chained step finished
        jax.block_until_ready(m["loss"])
        jax.device_get(m["loss"])

    hb(f"compile_start: jitting train step (model={cfg['model']}, "
       f"batch={batch}) — first dispatch compiles")
    tc = time.perf_counter()
    for i in range(warmup):
        state, metrics = train_step(state, dbatch, rng)
        if i == 0:
            fence(metrics)
            hb(f"compile_done in {time.perf_counter() - tc:.1f}s; warming up")
    fence(metrics)
    hb(f"warmup_done ({warmup} steps); timing {iters} steps")

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, dbatch, rng)
    fence(metrics)
    dt = time.perf_counter() - t0
    hb(f"timing_done: {dt:.2f}s for {iters} dispatches x {ksteps} step(s)")
    return batch * iters * ksteps / dt / n_chips


def main():
    from podtpu.config import get_configs, setup_platform

    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--batches", default="32")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--ksteps", default="1",
                    help="comma list; >1 scans K train steps per dispatch")
    ap.add_argument("--repeat", type=int, default=1,
                    help="loop the (batch x ksteps) grid N times — "
                         "interleaved A/B cells (CLAUDE.md: consecutive "
                         "runs drift up to -7%%; interleave within a block)")
    args = ap.parse_args()
    setup_platform(args.platform)

    cfg = get_configs(args.cfg)
    for rep in range(args.repeat):
        for b in [int(x) for x in args.batches.split(",")]:
            for k in [int(x) for x in args.ksteps.split(",")]:
                ips = bench(cfg, b, iters=args.iters, ksteps=k)
                print(json.dumps({
                    "model": cfg["model"], "input_size": cfg["input_size"],
                    "batch": b, "ksteps": k, "rep": rep,
                    "images_per_sec_per_chip": round(ips, 2),
                }), flush=True)


if __name__ == "__main__":
    main()
