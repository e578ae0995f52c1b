"""Repopulate .jax_cache/ for the driver bench and re-pack .jax_cache_seed.tar.

Run this ONCE after any change to the flagship train-step path (model,
loss, encoder, steps.py, optimizer wiring): the persistent-cache key is a
hash of the traced HLO, so such a change strands the committed seed (the
seed then harmlessly misses and the capture falls back to the 456-569 s
cold compile — larger than the 540 s capture budget, i.e. a guaranteed
failed capture; see RESULTS.md round-13).

What it does:

  1. runs ``python bench.py`` with long watchdog budgets so the cold
     compile completes and writes the new train-step executable into
     .jax_cache/ (needs the real TPU; ~8-10 min cold, ~3 min if warm);
  2. re-packs ONLY the capture-critical entries (the flagship
     ``jit_train_step`` + the small pre-compile programs — not the
     optional per-family/K-step programs other tools may have cached)
     into .jax_cache_seed.tar;
  3. prints the git command to commit the refreshed seed.

Usage:  python tools/refresh_cache_seed.py [--skip-bench]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tarfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".jax_cache")
SEED = os.path.join(REPO, ".jax_cache_seed.tar")

# Entries the driver capture needs. Everything bench.py's worker compiles
# is prefixed with one of these; per-family A/B programs (bench_family on
# other models / ksteps>1) also land as jit_train_step but are much
# smaller than the flagship batch-128 program — we keep every
# jit_train_step entry written by the bench run to stay simple, and cap
# total size as a sanity check.
PREFIXES = (
    "jit_train_step-",
    "jit_init_fn-",
    "jit__lambda-",
    "jit__threefry_seed-",
    "jit_broadcast_in_dim-",
    "jit_convert_element_type-",
)
MAX_SEED_BYTES = 200 * 1024 * 1024


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--skip-bench", action="store_true",
        help="only re-pack the tarball from the current .jax_cache/",
    )
    args = ap.parse_args()

    if not args.skip_bench:
        env = dict(
            os.environ,
            BENCH_DEADLINE_S="3000",
            BENCH_ATTEMPT_TIMEOUT_S="2400",
            BENCH_INIT_TIMEOUT_S="600",
            BENCH_COMPILE_TIMEOUT_S="2300",
        )
        print("running bench.py with long budgets to (re)populate the cache "
              "(cold compile over the tunnel is ~8-10 min)...", flush=True)
        rc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            cwd=REPO, env=env,
        ).returncode
        if rc != 0:
            print(f"bench.py failed rc={rc}; not touching the seed",
                  file=sys.stderr)
            return rc

    entries = sorted(
        f for f in os.listdir(CACHE)
        if f.endswith("-cache") and f.startswith(PREFIXES)
    )
    if not any(f.startswith("jit_train_step-") for f in entries):
        print("no jit_train_step entry in .jax_cache/ — refusing to pack a "
              "seed that cannot warm the capture", file=sys.stderr)
        return 1
    total = sum(os.path.getsize(os.path.join(CACHE, f)) for f in entries)
    if total > MAX_SEED_BYTES:
        print(f"seed would be {total/1e6:.0f} MB (> {MAX_SEED_BYTES/1e6:.0f}"
              " MB cap) — prune stale jit_train_step-* entries from "
              ".jax_cache/ first (keep the newest)", file=sys.stderr)
        return 1

    tmp = SEED + ".tmp"
    with tarfile.open(tmp, "w") as tf:
        for f in entries:
            tf.add(os.path.join(CACHE, f), arcname=f)
    os.replace(tmp, SEED)
    print(f"packed {len(entries)} entries ({total/1e6:.1f} MB) -> {SEED}")
    print("now commit it:  git add .jax_cache_seed.tar && "
          "git commit -m 'Refresh compile-cache seed'")
    return 0


if __name__ == "__main__":
    sys.exit(main())
