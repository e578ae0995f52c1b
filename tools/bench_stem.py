"""A/B the fused Pallas stem against the XLA lowering, op-level, on TPU.

Measures fwd+bwd wall time of stage0(conv3x3 3->32 + train-BN + ReLU) +
2x2 pool at the flagship shape (batch 128 @416), isolated from the rest of
the step, plus forward-only. Run on the real chip:

    python tools/bench_stem.py [--batch 128] [--size 416] [--platform cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--size", type=int, default=416)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from podtpu.ops.pallas.stem_fused import make_fused_stem, stem_pool_reference

    B, S = args.batch, args.size
    cd = jnp.dtype(args.dtype)
    eps = 1e-5
    r = np.random.default_rng(0)
    x = jnp.asarray(r.uniform(0, 1, (B, S, S, 3)).astype(np.float32))
    w = jnp.asarray((r.normal(size=(3, 3, 3, 32)) * 0.1).astype(np.float32))
    scale = jnp.ones((32,), jnp.float32)
    bias = jnp.zeros((32,), jnp.float32)
    g = jnp.asarray(r.normal(size=(B, S // 2, S // 2, 32)).astype(np.float32)).astype(cd)

    fused = make_fused_stem(S, S, 3, 32, cd.name, eps)

    # RTT floor of the tunnel: a trivial jitted dispatch with a fresh input
    # each call (the axon terminal memoizes identical dispatches).
    null = jax.jit(lambda b_: jnp.sum(b_ * 1.0000001))
    jax.block_until_ready(null(bias))
    rtts = []
    for k in range(8):
        t0 = time.perf_counter()
        jax.device_get(null(bias + k * 1e-6))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts)) * 1e3
    print(f"dispatch RTT floor {rtt:.3f} ms", flush=True)
    seed = [1]

    def run(name, scalar_fn):
        """Time ``scalar_fn(bias) -> f32 scalar``, one blocking dispatch per
        iteration with a DISTINCT bias each call (defeats the terminal's
        memoization); reports median minus the RTT floor."""
        print(f"{name}: compiling...", flush=True)
        f = jax.jit(scalar_fn)
        jax.block_until_ready(f(bias))
        times = []
        for _ in range(args.iters):
            seed[0] += 1
            b_ = bias + seed[0] * 1e-6
            t0 = time.perf_counter()
            # device_get of the scalar: a real round trip
            # (block_until_ready can return early over the tunnel)
            jax.device_get(f(b_))
            times.append(time.perf_counter() - t0)
        dt = float(np.median(times)) * 1e3
        print(f"{name:28s} {dt - rtt:8.3f} ms  (raw {dt:.3f})", flush=True)

    # forward only
    f_x = lambda *a: stem_pool_reference(*a, eps, cd)[0]
    f_p = lambda *a: fused(*a)[0]
    run("xla fwd",
        lambda b_: jnp.sum(f_x(x, w, scale, b_).astype(jnp.float32)))
    run("pallas fwd",
        lambda b_: jnp.sum(f_p(x, w, scale, b_).astype(jnp.float32)))
    o1 = jax.jit(f_x)(x, w, scale, bias)
    o2 = jax.jit(f_p)(x, w, scale, bias)
    d = jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)))
    print(f"  fwd maxdiff {float(d):.3e}")

    # fwd+bwd (vjp against a fixed cotangent)
    def mk(fn, scalar=False):
        def fb(b_):
            out, vjp = jax.vjp(lambda w2, s2, b2: fn(x, w2, s2, b2), w, scale, b_)
            grads = vjp(g)
            if scalar:
                return sum(jnp.sum(t.astype(jnp.float32)) for t in grads)
            return grads
        return fb

    run("xla fwd+bwd", mk(f_x, scalar=True))
    run("pallas fwd+bwd", mk(f_p, scalar=True))
    g1 = jax.jit(mk(f_x))(bias)
    g2 = jax.jit(mk(f_p))(bias)
    for name, a, b in zip(("dw", "dscale", "dbias"), g1, g2):
        num = float(jnp.linalg.norm((a - b).ravel()))
        den = float(jnp.linalg.norm(a.ravel())) + 1e-9
        print(f"  {name} rel-l2 {num / den:.4f}")


if __name__ == "__main__":
    main()
