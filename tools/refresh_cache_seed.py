"""Refresh the two tracked warm-capture artifacts after train-step changes.

The driver bench must be WARM to fit its budget (cold compile 456-569 s >
the 540 s capture window). Two tracked artifacts provide that warmth, both
keyed to the exact traced program — so BOTH go stale when the flagship
train-step path changes (model, loss, encoder, steps.py, optimizer wiring)
or when jax/jaxlib/libtpu versions bump:

  * ``.bench_aot.bin``     — the serialized compiled executable; bench.py's
                             fast path executes it with zero retrace
                             (tools/bench_aot.py);
  * ``.jax_cache_seed.tar``— persistent-compile-cache entries; the fallback
                             path's compile hits these instead of going cold.

This tool refreshes both in one command on the real TPU:

  1. runs ``python bench.py`` with long watchdog budgets and the AOT path
     DISABLED, so the traced compile completes and (re)writes the
     train-step entry into .jax_cache/;
  2. packs the AOT artifact (``tools/bench_aot.py pack`` — a cache-hit
     compile + executable serialization);
  3. re-packs the seed tarball with ONLY the newest ``jit_train_step``
     entry plus the small pre-compile programs (stale/superseded train-step
     programs otherwise accrete ~21-30 MB git blobs per refresh — the
     round-4 seed had bloated to 79 MB with two dead entries);
  4. verifies the refreshed seed actually HITs: reruns bench.py (AOT
     disabled) and asserts the compile wrote no new train-step entry.

Usage:  python tools/refresh_cache_seed.py [--skip-bench] [--skip-verify]
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys
import tarfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".jax_cache")
SEED = os.path.join(REPO, ".jax_cache_seed.tar")

# Small always-needed programs (state init, on-device batch synthesis, rng
# plumbing) — a few hundred KB total. jit_train_step is handled separately:
# only the NEWEST entry is packed.
SMALL_PREFIXES = (
    "jit_init_fn-",
    "jit__lambda-",
    "jit__threefry_seed-",
    "jit_broadcast_in_dim-",
    "jit_convert_element_type-",
)
MAX_SEED_BYTES = 50 * 1024 * 1024


def _train_step_entries(cache_dir: str = CACHE) -> list[str]:
    return sorted(
        (f for f in os.listdir(cache_dir)
         if f.startswith("jit_train_step-") and f.endswith("-cache")),
        key=lambda f: os.path.getmtime(os.path.join(cache_dir, f)),
    )


def _run_bench(why: str, cache_dir: str | None = None) -> int:
    env = dict(
        os.environ,
        BENCH_DEADLINE_S="3000",
        BENCH_ATTEMPT_TIMEOUT_S="2400",
        BENCH_INIT_TIMEOUT_S="600",
        BENCH_COMPILE_TIMEOUT_S="2300",
        BENCH_DISABLE_AOT="1",  # force the traced path so the cache is hit
    )
    if cache_dir:
        env["PODTPU_COMPILE_CACHE_DIR"] = cache_dir
    print(f"running bench.py ({why}; AOT disabled, long budgets)...",
          flush=True)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")], cwd=REPO, env=env,
    ).returncode


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true",
                    help="re-pack from the current .jax_cache/ without "
                         "running bench (the newest jit_train_step entry "
                         "there MUST be the flagship program)")
    ap.add_argument("--skip-verify", action="store_true",
                    help="skip the second bench run that proves the cache hit")
    args = ap.parse_args()

    # Populate a FRESH dir (auto-seeded from the current tarball, so an
    # unchanged program hits instead of recompiling): the shared .jax_cache/
    # accretes per-family/K-sweep jit_train_step programs whose mtimes can
    # outdate the flagship's (a cache HIT does not touch the file), so
    # "newest entry in .jax_cache/" can select the WRONG program. In the
    # fresh dir the newest train-step entry is by construction the program
    # the bench just ran.
    src = CACHE
    if not args.skip_bench:
        src = os.path.join(REPO, ".jax_cache_refresh")
        shutil.rmtree(src, ignore_errors=True)
        os.makedirs(src)
        rc = _run_bench("populating a fresh cache dir", cache_dir=src)
        if rc != 0:
            print(f"bench.py failed rc={rc}; not touching the artifacts",
                  file=sys.stderr)
            return rc

    steps = _train_step_entries(src)
    if not steps:
        print(f"no jit_train_step entry in {src} — refusing to pack a "
              "seed that cannot warm the capture", file=sys.stderr)
        return 1
    newest_step = steps[-1]
    if len(steps) > 1:
        print(f"keeping newest of {len(steps)} jit_train_step entries: "
              f"{newest_step} (dropping {len(steps) - 1} stale)")

    # AOT artifact: compile + serialize. The flat-step wrapper is a
    # DIFFERENT program name than jit_train_step, so the first pack after a
    # train-step change cold-compiles (~8-10 min over the tunnel; later
    # packs hit the jit_flat_step entry the fresh dir now carries). A
    # subprocess so its jax config cannot leak elsewhere.
    print("packing .bench_aot.bin (AOT executable)...", flush=True)
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "bench_aot.py"), "pack"],
        cwd=REPO, env=dict(os.environ, PODTPU_COMPILE_CACHE_DIR=src),
    ).returncode
    if rc != 0:
        print(f"bench_aot pack failed rc={rc}; seed will still be refreshed "
              "(the fallback path stays warm)", file=sys.stderr)

    entries = [newest_step] + sorted(
        f for f in os.listdir(src)
        if f.endswith("-cache") and f.startswith(SMALL_PREFIXES)
    )
    total = sum(os.path.getsize(os.path.join(src, f)) for f in entries)
    if total > MAX_SEED_BYTES:
        print(f"seed would be {total/1e6:.0f} MB (> {MAX_SEED_BYTES/1e6:.0f}"
              " MB cap) — the flagship program alone should be ~30 MB; "
              "inspect .jax_cache/ for bloat", file=sys.stderr)
        return 1
    tmp = SEED + ".tmp"
    with tarfile.open(tmp, "w") as tf:
        for f in entries:
            tf.add(os.path.join(src, f), arcname=f)
    os.replace(tmp, SEED)
    print(f"packed {len(entries)} entries ({total/1e6:.1f} MB) -> {SEED}")

    if not args.skip_verify and not args.skip_bench:
        # wipe-recovery rehearsal: run against an EMPTY cache dir seeded
        # only from the fresh tarball; a MISS writes a second train-step
        # entry there, which fails the assert.
        vdir = os.path.join(REPO, ".jax_cache_verify")
        shutil.rmtree(vdir, ignore_errors=True)
        os.makedirs(vdir)
        rc = _run_bench("verifying the seeded key HITs from a fresh dir",
                        cache_dir=vdir)
        got = sorted(f for f in os.listdir(vdir)
                     if f.startswith("jit_train_step-"))
        shutil.rmtree(vdir, ignore_errors=True)
        if rc != 0 or got != [newest_step]:
            print(f"VERIFY FAILED: rc={rc}, train-step entries={got} "
                  f"(expected exactly [{newest_step}]) — the seed does NOT "
                  "warm a fresh workspace", file=sys.stderr)
            return 1
        print("verified: fresh-dir run hit the seeded entry (no recompile)")

    if src != CACHE:
        # merge the refreshed entries into the live cache (plus the
        # jit_flat_step AOT-pack program so the NEXT pack in this workspace
        # hits instead of cold-compiling), then drop the dir
        os.makedirs(CACHE, exist_ok=True)
        extra = [f for f in os.listdir(src)
                 if f.startswith("jit_flat_step-") and f.endswith("-cache")]
        for f in entries + extra:
            dest = os.path.join(CACHE, f)
            if not os.path.exists(dest):
                shutil.copy2(os.path.join(src, f), dest)
        shutil.rmtree(src, ignore_errors=True)

    print("now commit:  git add .jax_cache_seed.tar .bench_aot.bin && "
          "git commit -m 'Refresh warm-capture artifacts'")
    return 0


if __name__ == "__main__":
    sys.exit(main())
