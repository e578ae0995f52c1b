"""Tracing / profiling / determinism utilities (SURVEY.md §5).

The reference's observability is ad-hoc (``Profile``/``Timeout`` context
managers, per-image wall-clock prints — utils/general.py:56-96,
inference_yolov3.py:67-71). TPU-native equivalents:

* :class:`Profile` — wall-clock context/decorator that blocks on device
  results so it times real work, not dispatch;
* :func:`trace` — a ``jax.profiler`` trace context writing a TensorBoard-
  compatible profile (xplane) directory;
* :class:`StepTimer` — rolling per-step timing -> images/sec;
* :func:`init_seeds` — one-call determinism (python/numpy seeds + a JAX key;
  JAX is deterministic by construction, numpy drives the data pipeline).
"""

from __future__ import annotations

import contextlib
import random
import time

import jax
import numpy as np


class Profile(contextlib.ContextDecorator):
    """with Profile('fwd') as p: ...  ->  p.dt seconds (device-synced)."""

    _fence_seq = 0  # distinct operand per fence: the axon terminal
    # memoizes identical dispatches

    def __init__(self, name: str = "", sync: bool = True):
        self.name = name
        self.sync = sync
        self.dt = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            # block on every live device array: pure jitted computations
            # carry no effect tokens, so jax.effects_barrier() would return
            # while they are still running and the timing would measure
            # dispatch, not execution
            jax.block_until_ready(jax.live_arrays())
            # then a real round trip: block_until_ready can return early
            # over the axon tunnel (CLAUDE.md). A fresh tiny computation
            # executes after all previously enqueued work (in-order TPU
            # stream), so fetching its scalar fences the region.
            Profile._fence_seq += 1
            import jax.numpy as jnp

            jax.device_get(jnp.float32(Profile._fence_seq) + 1.0)
        self.dt = time.perf_counter() - self.start
        if self.name:
            print(f"{self.name}: {1000 * self.dt:.2f} ms")
        return False


class Timeout(contextlib.ContextDecorator):
    """SIGALRM-based timeout context (general.py:65-82 role): raises or
    suppresses ``TimeoutError`` after ``seconds``. Unix main-thread only."""

    def __init__(self, seconds: float, suppress: bool = False,
                 msg: str = "timed out"):
        self.seconds = seconds
        self.suppress = suppress
        self.msg = msg

    def _handler(self, signum, frame):
        raise TimeoutError(self.msg)

    def __enter__(self):
        import signal

        self._old = signal.signal(signal.SIGALRM, self._handler)
        signal.setitimer(signal.ITIMER_REAL, self.seconds)
        return self

    def __exit__(self, exc_type, exc, tb):
        import signal

        signal.setitimer(signal.ITIMER_REAL, 0)
        signal.signal(signal.SIGALRM, self._old)
        return self.suppress and exc_type is TimeoutError


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace: view with TensorBoard's profile plugin or xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling window of step durations -> steps/sec and images/sec."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._last: float | None = None

    def tick(self) -> float | None:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)

    def images_per_sec(self, batch_size: int) -> float:
        return self.steps_per_sec() * batch_size


def init_seeds(seed: int = 0) -> jax.Array:
    """Seed python + numpy global RNGs; return a JAX PRNG key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
