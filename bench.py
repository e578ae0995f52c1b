"""Benchmark: YOLOv3-darknet19 @416 training throughput (images/sec/chip).

Runs the full jitted training step (forward + vectorized target encoding +
CIoU loss + backward + SGD update, bf16 compute) on the attached TPU chip
with device-resident synthetic batches, so the number is the compute-path
ceiling the input pipeline must feed. The harness itself lives in
tools/bench_family.py (shared with the per-family probe so the two tools
stay methodology-identical).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Robustness (round 4): the axon tunnel has a measured failure mode where
device init (`jax.devices()`) hangs for tens of minutes (RESULTS.md round-9)
— exactly what turned the round-3 driver capture into a silent rc=124.
This script therefore runs the actual measurement in a WORKER SUBPROCESS
(`python bench.py --worker`) under a parent watchdog:

  * the worker prints timestamped heartbeat lines to stderr at every phase
    (init start/done, compile start/done, warmup, timing) so a timeout tail
    diagnoses itself;
  * the parent kills a worker whose device init exceeds INIT_TIMEOUT_S or
    whose attempt exceeds ATTEMPT_TIMEOUT_S, and retries ONCE;
  * the parent exits nonzero with a clear stderr message well inside the
    driver budget (BENCH_DEADLINE_S, default 540 s) instead of being killed
    silently by the driver's timeout;
  * FAST PATH (round 5): the worker first tries the tracked AOT artifact
    .bench_aot.bin — the serialized COMPILED flagship executable
    (tools/bench_aot.py) — and runs it with ZERO tracing/lowering/compile.
    The warm trace+cache path still paid ~142 s of client-side retrace per
    capture (RESULTS.md round-13); this removes the class. Any staleness
    (version bump, shape change, unreadable file) falls back LOUDLY
    ('AOT ARTIFACT STALE: ...') to the traced path. BENCH_DISABLE_AOT=1
    forces the fallback;
  * fallback: the JAX persistent compilation cache on a repo-local dir
    (.jax_cache/; PODTPU_COMPILE_CACHE_DIR overrides) so the train-step
    program compiles over the slow tunnel once ever, not once per capture;
  * the cache dir is untracked and a workspace reset (git clean / fresh
    clone between rounds) wipes it — observed at round-4 start, where the
    first capture died mid-cold-compile. The worker therefore re-seeds
    .jax_cache/ from the TRACKED tarball .jax_cache_seed.tar
    (podtpu.config.seed_compile_cache) before attaching; with the seed the
    warm path measured init 10 s + compile 148 s (train-step cache hit,
    ~6 s post-hit deserialize/upload) + timing 1.3 s;
  * if the fallback compile MISSES the seeded cache (a new train-step
    entry appears), the tail says 'SEED STALE (persistent-cache MISS)' and
    names the fix (tools/refresh_cache_seed.py) — a jax/libtpu bump no
    longer dies as an undiagnosable timeout. jax/jaxlib/device versions
    are heartbeat-logged every capture;
  * a compile phase still running at COMPILE_TIMEOUT_S (330 s; warm max
    measured 293 s) is killed EARLY — it is a tunnel stall or a cold
    compile, neither finishes inside the deadline — so the one retry
    (warm attempt ~160-300 s) still fits the remaining budget.

Baseline: the reference publishes no throughput numbers
(BASELINE.json.published == {}). We use REF_GPU_IPS = 130 images/sec as the
estimated reference training throughput on its single unspecified GPU — a
YOLOv3-darknet19@416 torch fwd+bwd at batch 64 is ~150-200 img/s on a
2080Ti-class card, and the reference's per-step CPU Python target-encoding
loop (SURVEY.md §3.1) drags it below that. vs_baseline = value / REF_GPU_IPS.

The baseline is an ESTIMATE (no GPU in this environment to measure the
reference), so vs_baseline carries roughly a 0.5-2x band; the absolute
images/sec/chip and the roofline position (RESULTS.md "Round-11": 675 GB/s
effective = 82% of HBM peak) are the hard numbers. Run-to-run variance over
the axon tunnel is ~±3% within a run, up to -7% between runs (CLAUDE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REF_GPU_IPS = 130.0
BATCH = 128

# Watchdog budget. The driver runs `python bench.py` under its own timeout
# (round 3 died at rc=124 with an empty tail); we self-impose a tighter
# deadline so failures are loud and diagnosable instead of silent.
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "540"))
INIT_TIMEOUT_S = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "210"))
ATTEMPT_TIMEOUT_S = float(os.environ.get("BENCH_ATTEMPT_TIMEOUT_S", "420"))
# Warm-cache compile (client tracing + cache deserialize + upload) measured
# 148-293 s; a compile still running past this is a tunnel stall or a cold
# compile (456-569 s), neither of which can finish inside DEADLINE_S — kill
# it early so the retry (warm attempt ~160-300 s) still fits the budget.
COMPILE_TIMEOUT_S = float(os.environ.get("BENCH_COMPILE_TIMEOUT_S", "330"))
# The AOT path's "compile" phase is a ~150 MB executable upload, not a
# compile: measured 3.6 s (server cache warm), 122.7 s, 278 s (cold, slow
# tunnel). Kill it earlier than a real compile so the retry — which
# ALWAYS runs the traced path (~130 s on the current backend) — still
# fits; an AOT retry would pay the same slow upload again.
AOT_UPLOAD_TIMEOUT_S = float(os.environ.get("BENCH_AOT_UPLOAD_TIMEOUT_S", "300"))

_T0 = time.time()


def _hb(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


# ---------------------------------------------------------------- worker ---

def worker() -> None:
    """The actual measurement. Heartbeats on stderr, final JSON on stdout."""
    # PODTPU_COMPILE_CACHE_DIR override keeps tools/refresh_cache_seed.py's
    # verify leg honest: it points this at an EMPTY dir seeded only from the
    # tarball, proving wipe-recovery rather than re-reading the live cache.
    cache_dir = os.environ.get("PODTPU_COMPILE_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    # A workspace reset wipes the untracked cache dir while the cold compile
    # (456-569 s) exceeds the capture budget; re-seed from the tracked
    # tarball first (pure-filesystem, no jax import).
    try:
        from podtpu.config import seed_compile_cache

        seed_compile_cache(cache_dir)
    except Exception as e:  # seed is best-effort; warming the slow way works
        _hb(f"cache_seed skipped: {e}")

    if os.environ.get("BENCH_LOG_CACHE"):
        import logging

        logging.basicConfig(level=logging.DEBUG)
        for name in ("jax._src.compiler", "jax._src.compilation_cache"):
            logging.getLogger(name).setLevel(logging.DEBUG)

    _hb("init_start: importing jax + attaching to device backend")
    import jax
    import jaxlib

    # Persistent compilation cache: the batch-128 train step compiles over
    # the tunnel once ever; later captures reload the serialized executable.
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except AttributeError:
        pass

    devs = jax.devices()
    # version drift is the one thing that silently strands BOTH warm paths
    # (AOT fingerprint + persistent-cache key); log it every capture so a
    # failed tail correlates itself against RESULTS.md headers
    _hb(f"versions: jax {jax.__version__} jaxlib {jaxlib.__version__} "
        f"device {devs[0].device_kind}")
    _hb(f"init_done: {len(devs)} device(s), platform={devs[0].platform}")

    # Fast path: deserialized AOT executable (tools/bench_aot.py) — no
    # tracing, no lowering, no compile; the ~142 s client-side retrace the
    # warm trace+cache path still paid (RESULTS.md round-13) is gone.
    if os.environ.get("BENCH_DISABLE_AOT", "0") != "1":
        from tools.bench_aot import StaleArtifact, bench_aot

        try:
            ips = bench_aot(batch=BATCH, warmup=3, iters=10, hb=_hb)
            _emit(ips)
            return
        except StaleArtifact as e:
            _hb(f"AOT ARTIFACT STALE: {e} — falling back to the "
                "trace+persistent-cache path")
    else:
        _hb("AOT path disabled (BENCH_DISABLE_AOT=1); using trace+cache path")

    from __graft_entry__ import _flagship_cfg
    from tools.bench_family import bench

    def cache_entries() -> set[str]:
        try:
            return {f for f in os.listdir(cache_dir)
                    if f.startswith("jit_train_step-")}
        except OSError:
            return set()

    before = cache_entries()
    cfg = _flagship_cfg(input_size=416, compute_dtype="bfloat16")
    ips = bench(cfg, BATCH, warmup=3, iters=10, hb=_hb)
    if cache_entries() - before:
        # the compile MISSED the seeded cache and wrote a fresh entry — the
        # committed seed no longer matches this program (jax/libtpu bump or
        # train-step change). Say so LOUDLY: without this line the next
        # fresh-workspace capture dies as a generic compile-timeout.
        _hb("SEED STALE (persistent-cache MISS): .jax_cache_seed.tar does "
            "not contain this train-step program — run "
            "tools/refresh_cache_seed.py and commit the refreshed seed + "
            ".bench_aot.bin")
    _emit(ips)


def _emit(ips: float) -> None:
    print(json.dumps({
        "metric": "yolov3_416_train_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / REF_GPU_IPS, 3),
    }), flush=True)


# ---------------------------------------------------------------- parent ---

class _Attempt:
    """One worker subprocess, monitored via its stderr heartbeats."""

    def __init__(self, disable_aot: bool = False) -> None:
        env = dict(os.environ)
        if disable_aot:
            env["BENCH_DISABLE_AOT"] = "1"
        self.proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)), env=env,
        )
        self.start = time.time()
        self.init_done = False
        self.compile_start_t: float | None = None
        self.compile_done = False
        self.aot_upload = False
        self.last_line = ""
        self.json_line: str | None = None
        self._threads = [
            threading.Thread(target=self._pump_stderr, daemon=True),
            threading.Thread(target=self._pump_stdout, daemon=True),
        ]
        for t in self._threads:
            t.start()

    def _pump_stderr(self) -> None:
        for line in self.proc.stderr:
            sys.stderr.write(line)
            sys.stderr.flush()
            self.last_line = line.rstrip()
            if "init_done" in line:
                self.init_done = True
            elif "compile_start" in line:
                self.compile_start_t = time.time()
                self.aot_upload = "AOT dispatch" in line
            elif "compile_done" in line:
                self.compile_done = True

    def _pump_stdout(self) -> None:
        for line in self.proc.stdout:
            s = line.strip()
            if s.startswith("{") and '"metric"' in s:
                self.json_line = s
            else:
                sys.stderr.write(line)
                sys.stderr.flush()

    def kill(self) -> None:
        try:
            self.proc.kill()
        except OSError:
            pass
        self.proc.wait()

    def poll_outcome(self, deadline: float) -> str | None:
        """'ok' | 'failed: why' | None (still running and within limits)."""
        rc = self.proc.poll()
        now = time.time()
        if rc is not None:
            for t in self._threads:
                t.join(timeout=5)
            if rc == 0 and self.json_line:
                return "ok"
            return f"failed: worker exited rc={rc} (last: {self.last_line!r})"
        if not self.init_done and now - self.start > INIT_TIMEOUT_S:
            self.kill()
            return (f"failed: device init exceeded {INIT_TIMEOUT_S:.0f}s "
                    f"(tunnel hang; last: {self.last_line!r})")
        limit = AOT_UPLOAD_TIMEOUT_S if self.aot_upload else COMPILE_TIMEOUT_S
        if (self.compile_start_t is not None and not self.compile_done
                and now - self.compile_start_t > limit):
            self.kill()
            what = ("AOT executable upload" if self.aot_upload
                    else "compile (tunnel stall or cold compile — is "
                         ".jax_cache/ seeded from .jax_cache_seed.tar?)")
            return (f"failed: {what} exceeded {limit:.0f}s "
                    f"(last: {self.last_line!r})")
        if now - self.start > ATTEMPT_TIMEOUT_S or now - _T0 > deadline:
            self.kill()
            return f"failed: attempt exceeded budget (last: {self.last_line!r})"
        return None


def main() -> None:
    for attempt in (1, 2):
        remaining = DEADLINE_S - (time.time() - _T0)
        if attempt == 2 and remaining < 150:
            _hb(f"no budget for retry ({remaining:.0f}s left)")
            break
        # the retry always takes the traced path: after an AOT failure
        # (slow upload, stale artifact edge) the predictable ~130 s
        # trace+compile beats re-paying the same upload
        _hb(f"attempt {attempt}: spawning worker (budget {remaining:.0f}s"
            + (", AOT disabled" if attempt == 2 else "") + ")")
        a = _Attempt(disable_aot=(attempt == 2))
        while True:
            outcome = a.poll_outcome(deadline=DEADLINE_S - 30)
            if outcome == "ok":
                print(a.json_line, flush=True)
                return
            if outcome is not None:
                _hb(f"attempt {attempt} {outcome}")
                break
            time.sleep(1.0)
    _hb("FAILED: no benchmark number produced within the self-imposed "
        f"deadline ({DEADLINE_S:.0f}s); see heartbeat tail above for the "
        "phase that stalled")
    sys.exit(1)


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        main()
