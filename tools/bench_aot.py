"""AOT-serialized flagship train step: bench without retracing.

The warm bench path still spent ~142 s per capture on CLIENT-side work
(tracing + lowering + cache-key hashing on this 1-vCPU host) before the
persistent compile cache could even answer — only ~6 s of the measured
147.9 s "compile" was post-hit deserialize/upload (RESULTS.md round-13).
That window was the remaining structural exposure: a tunnel stall inside
it ate a capture attempt in round 4.

This module removes the class: the COMPILED executable is serialized once
(``pack()``, run by tools/refresh_cache_seed.py on the real chip) into the
tracked artifact ``.bench_aot.bin``; the bench worker deserializes and
executes it directly — zero tracing, zero lowering, zero compile.

Pickling detail: a ``TrainState`` treedef is not picklable (its static
``tx`` field holds optax closures), so the step is wrapped to take and
return FLAT leaf lists (``flat_step(state_leaves, batch_leaves, rng) ->
(new_state_leaves, loss)``). The treedefs needed to (un)flatten are
rebuilt locally at load time from a freshly constructed state — same code,
same structure — and the serialized in/out trees are plain list/tuple
structures that pickle fine.

Staleness: the artifact embeds an environment fingerprint (jax/jaxlib
versions, platform, device kind, batch/input shape). Any mismatch — or any
deserialize/execute error — raises ``StaleArtifact`` so bench.py can fall
back to the trace+persistent-cache path with a LOUD diagnostic instead of
dying as a generic timeout.
"""

from __future__ import annotations

import os
import pickle
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ARTIFACT = os.path.join(REPO, ".bench_aot.bin")
BATCH = 128
INPUT_SIZE = 416


class StaleArtifact(RuntimeError):
    """The AOT artifact cannot serve this environment; fall back loudly."""


def _train_step_source_hash() -> str:
    """sha256 over every source file the compiled step can depend on (the
    whole podtpu package + the flagship-cfg and input-builder modules).
    Deliberately conservative: ANY library change invalidates the
    artifact — the cost is one loud fallback to the traced path (~130 s),
    vs silently benchmarking a stale pre-change executable forever."""
    import hashlib

    h = hashlib.sha256()
    pkg = os.path.join(REPO, "podtpu")
    files = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(pkg) for f in fs if f.endswith(".py")
    ) + [os.path.join(REPO, "__graft_entry__.py"),
         os.path.join(REPO, "tools", "bench_family.py")]
    for p in files:
        h.update(os.path.relpath(p, REPO).encode())
        with open(p, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def env_fingerprint(batch: int = BATCH, input_size: int = INPUT_SIZE) -> dict:
    import jax
    import jaxlib

    dev = jax.devices()[0]
    return {
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "platform": dev.platform,
        "device_kind": dev.device_kind,
        "n_devices": len(jax.devices()),
        "batch": batch,
        "input_size": input_size,
        "source": _train_step_source_hash(),
    }


def _build_inputs(batch: int = BATCH, input_size: int = INPUT_SIZE):
    """Flagship state + synthetic device batch via the SHARED builder
    (tools/bench_family.build_inputs) so AOT and traced paths time the
    same program on the same data by construction."""
    from __graft_entry__ import _flagship_cfg
    from tools.bench_family import build_inputs

    cfg = _flagship_cfg(input_size=input_size, compute_dtype="bfloat16")
    mesh, state, dbatch, rng = build_inputs(cfg, batch)
    return cfg, mesh, state, dbatch, rng


def _flat_step_fn(cfg: dict, mesh, state, dbatch):
    """The train step over flat leaf lists (closure holds the treedefs)."""
    import jax

    from podtpu.train.steps import make_train_step

    state_def = jax.tree_util.tree_structure(state)
    batch_def = jax.tree_util.tree_structure(dbatch)
    inner = make_train_step(cfg, mesh, donate=False, jit=False)

    def flat_step(state_leaves, batch_leaves, rng):
        st = jax.tree_util.tree_unflatten(state_def, state_leaves)
        b = jax.tree_util.tree_unflatten(batch_def, batch_leaves)
        st2, metrics = inner(st, b, rng)
        return jax.tree_util.tree_leaves(st2), metrics["loss"]

    return flat_step


def pack(path: str = ARTIFACT, batch: int = BATCH,
         input_size: int = INPUT_SIZE, hb=print) -> str:
    """Compile the flagship step AOT and serialize the executable.

    Run on the target chip (tools/refresh_cache_seed.py does). The compile
    goes through the persistent cache like any other, so a warm .jax_cache/
    makes this fast; cold it is the usual 8-10 min over the tunnel.
    """
    import jax
    from jax.experimental import serialize_executable as se

    from podtpu.train.steps import compiler_options

    cfg, mesh, state, dbatch, rng = _build_inputs(batch, input_size)
    state_leaves = jax.tree_util.tree_leaves(state)
    batch_leaves = jax.tree_util.tree_leaves(dbatch)
    flat_step = _flat_step_fn(cfg, mesh, state, dbatch)

    hb(f"aot_pack: lowering+compiling (batch={batch}, size={input_size})")
    t0 = time.time()
    compiled = jax.jit(
        flat_step, donate_argnums=(0,),
        compiler_options=compiler_options(cfg),
    ).lower(state_leaves, batch_leaves, rng).compile()
    hb(f"aot_pack: compiled in {time.time() - t0:.1f}s; serializing")
    payload, in_tree, out_tree = se.serialize(compiled)
    import zlib

    # zlib for the TRACKED file only (the raw executable is ~150 MB, ~5x
    # compressible); the device still receives the raw bytes at load time
    blob = zlib.compress(pickle.dumps({
        "fingerprint": env_fingerprint(batch, input_size),
        "payload": payload,
        "in_tree": in_tree,
        "out_tree": out_tree,
    }), 6)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    hb(f"aot_pack: wrote {path} ({len(blob) / 1e6:.1f} MB compressed)")
    return path


def load(path: str = ARTIFACT, batch: int = BATCH,
         input_size: int = INPUT_SIZE):
    """Deserialize the packed executable; raises StaleArtifact on any
    mismatch so callers fall back explicitly."""
    from jax.experimental import serialize_executable as se

    if not os.path.isfile(path):
        raise StaleArtifact(f"{os.path.basename(path)} missing")
    try:
        with open(path, "rb") as f:
            raw = f.read()
        if raw[:1] == b"\x78":  # zlib-compressed (current format)
            import zlib

            raw = zlib.decompress(raw)
        d = pickle.loads(raw)
    except Exception as e:
        raise StaleArtifact(f"unreadable artifact: {e!r}") from e
    fp = env_fingerprint(batch, input_size)
    if d.get("fingerprint") != fp:
        raise StaleArtifact(
            f"fingerprint mismatch: artifact {d.get('fingerprint')} vs "
            f"environment {fp} — re-run tools/refresh_cache_seed.py")
    try:
        return se.deserialize_and_load(d["payload"], d["in_tree"],
                                       d["out_tree"])
    except Exception as e:
        raise StaleArtifact(f"deserialize failed: {e!r}") from e


def bench_aot(batch: int = BATCH, input_size: int = INPUT_SIZE,
              warmup: int = 3, iters: int = 10, hb=print,
              path: str = ARTIFACT) -> float:
    """Time the deserialized executable — same fences/warmup/chaining as
    tools/bench_family.bench, minus every trace/lower/compile phase."""
    import jax

    # staleness check FIRST: a stale artifact must not pay the ~10 s
    # device-state build that the traced fallback then repeats
    hb("aot_load: deserializing packed executable (no retrace)")
    t0 = time.time()
    loaded = load(path, batch, input_size)
    hb(f"aot_load done in {time.time() - t0:.1f}s")
    _, _, state, dbatch, rng = _build_inputs(batch, input_size)

    state_leaves = jax.tree_util.tree_leaves(state)
    batch_leaves = jax.tree_util.tree_leaves(dbatch)

    def fence(loss):
        jax.block_until_ready(loss)
        jax.device_get(loss)

    # first call uploads the executable to the chip; fence it separately.
    # Execute-time failures here are staleness the fingerprint cannot see
    # (e.g. tunnel-side compiler drift with unchanged client versions) —
    # raise StaleArtifact so bench.py falls back in-process instead of
    # burning the whole attempt.
    hb("compile_start: first AOT dispatch (upload, no compile)")
    try:
        state_leaves, loss = loaded(state_leaves, batch_leaves, rng)
        fence(loss)
    except Exception as e:
        raise StaleArtifact(
            f"deserialized program failed to execute: {e!r}") from e
    hb("compile_done: AOT dispatch live; warming up")
    for _ in range(warmup - 1):
        state_leaves, loss = loaded(state_leaves, batch_leaves, rng)
    fence(loss)
    hb(f"warmup_done ({warmup} steps); timing {iters} steps")
    t0 = time.perf_counter()
    for _ in range(iters):
        state_leaves, loss = loaded(state_leaves, batch_leaves, rng)
    fence(loss)
    dt = time.perf_counter() - t0
    hb(f"timing_done: {dt:.2f}s for {iters} steps")
    return batch * iters / dt / len(jax.devices())


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("cmd", choices=["pack", "bench"])
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--input-size", type=int, default=INPUT_SIZE)
    ap.add_argument("--artifact", default=ARTIFACT)
    ap.add_argument("--platform", default=None,
                    help="cpu for local verification; default = the real chip")
    args = ap.parse_args()
    from podtpu.config import setup_platform

    setup_platform(args.platform)
    if args.cmd == "pack":
        pack(args.artifact, args.batch, args.input_size)
    else:
        ips = bench_aot(args.batch, args.input_size, path=args.artifact)
        print(f"{ips:.2f} images/sec/chip")
