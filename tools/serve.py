"""Minimal HTTP serving demo around an exported serving artifact.

The deployment unit is the ``export_model.py --with-postprocess`` artifact
(forward + decode + NMS in one compiled graph; StableHLO or .tflite). This
stdlib server wraps it in a production-shaped request loop so the artifact
can be exercised from anywhere that can POST an image:

    python tools/serve.py --artifact model.stablehlo --size 416 \
        [--preprocess letterbox|resize] [--names voc.names] [--port 8000]

    curl -s -X POST --data-binary @dog.jpg localhost:8000/predict | jq .

Responses are JSON rows with boxes in BOTH the network's input pixels and
the original image's pixels (the inverse of the chosen preprocessing).
``GET /`` returns the artifact metadata; ``GET /healthz`` liveness;
``GET /stats`` request/error counts, latency percentiles, and the
micro-batch fill histogram. SIGTERM/SIGINT shut down gracefully (in-flight
requests finish; final stats printed).

``--max-batch N`` (with ``--window-ms``) turns on micro-batching — the
TPU-idiomatic way to serve concurrent load: requests arriving within the
window share ONE padded, fixed-shape device dispatch and ride the MXU's
batch dimension instead of queueing sequential batch-1 calls (on-chip,
batch-64 eval costs ~54 ms vs 64 serial batch-1 calls at ~8 ms each).
Every dispatch is padded to exactly N so XLA compiles one shape; use a
symbolic-batch artifact (``export_model.py --batch dyn``) or one exported
at batch N. Default is the old behavior: batch-1 per request.
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import cv2
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from podtpu.config import setup_platform  # noqa: E402
from podtpu.data.augment import letterbox  # noqa: E402
from podtpu.utils.viz import load_names  # noqa: E402


class Stats:
    """Thread-safe serving metrics: request/error counts, latency
    percentiles over a sliding window, and the micro-batch fill histogram
    (how full each device dispatch was — THE efficiency number for padded
    fixed-shape serving: fill 1/N means you pay N rows of FLOPs per
    image)."""

    def __init__(self, window: int = 1000):
        from collections import deque

        self._lock = threading.Lock()
        self._lat = deque(maxlen=window)
        self.requests = 0
        self.errors = 0
        self.fills: dict[int, int] = {}
        self.t0 = time.monotonic()

    def record(self, latency_s: float):
        with self._lock:
            self.requests += 1
            self._lat.append(latency_s)

    def record_error(self):
        with self._lock:
            self.errors += 1

    def record_fill(self, n: int):
        with self._lock:
            self.fills[n] = self.fills.get(n, 0) + 1

    def snapshot(self) -> dict:
        with self._lock:
            lat = sorted(self._lat)
            fills = dict(sorted(self.fills.items()))
            reqs, errs = self.requests, self.errors
        pct = (lambda q: round(lat[min(len(lat) - 1,
                                       int(q * len(lat)))] * 1000, 2)
               if lat else None)
        dispatches = sum(fills.values())
        images = sum(n * c for n, c in fills.items())
        return {
            "uptime_s": round(time.monotonic() - self.t0, 1),
            "requests": reqs,
            "errors": errs,
            "latency_ms": {"p50": pct(0.50), "p90": pct(0.90),
                           "p99": pct(0.99)},
            "batch_fill": fills or None,
            "mean_fill": (round(images / dispatches, 2)
                          if dispatches else None),
        }


class MicroBatcher:
    """Coalesce concurrent single-image requests into one device dispatch.

    A single worker thread collects submissions; a batch launches when
    ``batch`` rows are pending or ``window_ms`` has passed since the first
    arrival, padded with zero rows to exactly ``batch`` so the compiled
    graph has one static shape. Results fan back out through per-request
    events. Padding rows cost device FLOPs but never a recompile — the
    right trade on TPU, where a second compiled shape costs seconds and
    batch FLOPs are nearly free until the MXU saturates.
    """

    def __init__(self, run, batch: int, window_ms: float,
                 stats: Stats | None = None, timeout_s: float = 30.0):
        self.run = run  # [batch, H, W, 3] float32 -> (dets, valid)
        self.batch = batch
        self.window = window_ms / 1000.0
        self.stats = stats
        self.timeout_s = timeout_s
        self._cv = threading.Condition()
        self._pending: list[list] = []  # [x_row, result, event]
        threading.Thread(target=self._loop, daemon=True).start()

    def submit(self, x_row: np.ndarray):
        slot = [x_row, None, threading.Event(), time.monotonic()]
        with self._cv:
            self._pending.append(slot)
            self._cv.notify()
        # bounded wait: a wedged device dispatch (or a dead worker thread)
        # must surface as a 503, not hang the handler thread forever
        if not slot[2].wait(timeout=self.timeout_s):
            with self._cv:  # don't let a late dispatch run it pointlessly
                if slot in self._pending:
                    self._pending.remove(slot)
            raise TimeoutError(
                f"micro-batch dispatch exceeded {self.timeout_s:.0f}s")
        if isinstance(slot[1], Exception):
            raise slot[1]
        return slot[1]

    def _loop(self):
        while True:
            with self._cv:
                while not self._pending:
                    self._cv.wait()
                # the window counts from the OLDEST pending arrival, so a
                # request left over from an overflowed batch doesn't wait a
                # fresh full window on top of the dispatch it already sat
                # through
                deadline = self._pending[0][3] + self.window
                while len(self._pending) < self.batch:
                    left = deadline - time.monotonic()
                    if left <= 0:
                        break
                    self._cv.wait(timeout=left)
                todo = self._pending[: self.batch]
                self._pending = self._pending[self.batch:]
            if self.stats is not None:
                self.stats.record_fill(len(todo))
            try:
                x = np.stack([s[0] for s in todo])
                if len(todo) < self.batch:
                    x = np.concatenate(
                        [x, np.zeros((self.batch - len(todo),) + x.shape[1:],
                                     x.dtype)])
                dets, valid = self.run(x)
                dets, valid = np.asarray(dets), np.asarray(valid)
                for i, s in enumerate(todo):
                    s[1] = (dets[i], valid[i])
            except Exception as e:  # fan the failure out to every waiter
                for s in todo:
                    s[1] = e
            for s in todo:
                s[2].set()


class Engine:
    """Artifact + preprocessing, shared across request threads (the jitted
    call is thread-safe; a lock serializes TFLite's stateful interpreter)."""

    def __init__(self, artifact: str, size: int, preprocess: str,
                 names: list[str], max_batch: int = 1,
                 window_ms: float = 5.0, max_body_bytes: int = 20 << 20,
                 timeout_s: float = 30.0):
        # imported after setup_platform so --platform cpu takes effect
        from podtpu.export.runner import artifact_runner

        self.run, self.batch = artifact_runner(artifact)
        self.size = size
        self.preprocess = preprocess
        self.names = names
        self.artifact = os.path.basename(artifact)
        # the jitted StableHLO call is thread-safe; only TFLite's stateful
        # interpreter needs serializing
        self._lock = (threading.Lock() if artifact.endswith(".tflite")
                      else contextlib.nullcontext())
        self.stats = Stats()
        self.max_body_bytes = max_body_bytes
        self.timeout_s = timeout_s
        self.batcher = None
        if max_batch > 1:
            if self.batch not in (None, max_batch):
                raise ValueError(
                    f"--max-batch {max_batch} needs a symbolic-batch artifact "
                    f"(--batch dyn) or one exported at batch {max_batch}; "
                    f"this artifact is fixed at batch {self.batch}")

            def run_locked(x):
                with self._lock:
                    return self.run(x)

            self.batcher = MicroBatcher(run_locked, max_batch, window_ms,
                                        stats=self.stats,
                                        timeout_s=timeout_s)

    def _prep(self, im: np.ndarray):
        h0, w0 = im.shape[:2]
        if self.preprocess == "letterbox":
            # scaleup=False matches the framework's validated eval path
            # (dataset letterboxes without upscaling at eval time)
            im, (r, _), (dw, dh) = letterbox(im, self.size, scaleup=False)
            # invert with the integer pads letterbox actually applied
            left, top = int(round(dw - 0.1)), int(round(dh - 0.1))
            inv = lambda cx, cy, w, h: (  # noqa: E731
                (cx - left) / r, (cy - top) / r, w / r, h / r)
        else:
            im = cv2.resize(im, (self.size, self.size),
                            interpolation=cv2.INTER_LINEAR)
            sx, sy = w0 / self.size, h0 / self.size
            inv = lambda cx, cy, w, h: (cx * sx, cy * sy, w * sx, h * sy)  # noqa: E731
        return im, inv

    def predict(self, img_bytes: bytes):
        t0 = time.monotonic()
        try:
            out = self._predict(img_bytes)
        except Exception:
            self.stats.record_error()
            raise
        self.stats.record(time.monotonic() - t0)
        return out

    def _predict(self, img_bytes: bytes):
        raw = cv2.imdecode(np.frombuffer(img_bytes, np.uint8),
                           cv2.IMREAD_COLOR)
        if raw is None:
            raise ValueError("could not decode image")
        im = cv2.cvtColor(raw, cv2.COLOR_BGR2RGB)
        im, inv = self._prep(im)
        from podtpu.export.runner import prepare_input

        x = prepare_input(im[None].astype(np.uint8))
        if self.batcher is not None:
            det0, valid0 = self.batcher.submit(x[0])
        else:
            if self.batch not in (None, 1):  # fixed-batch artifact: pad to B
                x = np.concatenate(
                    [x, np.zeros((self.batch - 1,) + x.shape[1:], x.dtype)])
            with self._lock:
                dets, valid = self.run(x)
            det0, valid0 = np.asarray(dets)[0], np.asarray(valid)[0]
        rows = []
        for cx, cy, w, h, conf, cls in det0[valid0]:
            ox, oy, ow, oh = inv(cx, cy, w, h)
            cls = int(cls)
            rows.append({
                "class_id": cls,
                "class_name": (self.names[cls] if cls < len(self.names)
                               else str(cls)),
                "confidence": round(float(conf), 4),
                "box_cxcywh_input": [round(float(v), 2)
                                     for v in (cx, cy, w, h)],
                "box_cxcywh_image": [round(float(v), 2)
                                     for v in (ox, oy, ow, oh)],
            })
        return {"detections": rows, "num_detections": len(rows)}

    def info(self):
        return {"artifact": self.artifact, "input_size": self.size,
                "preprocess": self.preprocess,
                "batch": self.batch or "dynamic",
                "micro_batch": (self.batcher.batch if self.batcher else 1),
                "num_classes": len(self.names) or None}


def make_handler(engine: Engine):
    class Handler(BaseHTTPRequestHandler):
        # socket-level guard: a client that stalls mid-body can't pin a
        # handler thread past the request timeout
        timeout = engine.timeout_s

        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = self.path.rstrip("/")
            if path in ("", "/info"):
                self._send(200, engine.info())
            elif path == "/healthz":
                # the server only binds after the warmup dispatch, so
                # liveness == readiness here
                self._send(200, {"status": "ok"})
            elif path == "/stats":
                self._send(200, engine.stats.snapshot())
            else:
                self._send(404, {"error": "GET /, /healthz, /stats; "
                                          "POST /predict"})

        def do_POST(self):
            if self.path.rstrip("/") != "/predict":
                self._send(404, {"error": "POST /predict"})
                return
            length = self.headers.get("Content-Length")
            if length is None:
                self._send(411, {"error": "Content-Length required"})
                return
            try:
                n = int(length)
                assert n >= 0
            except (ValueError, AssertionError):
                engine.stats.record_error()
                self._send(400, {"error": f"bad Content-Length: {length!r}"})
                return
            if n == 0:
                engine.stats.record_error()
                self._send(400, {"error": "empty body"})
                return
            if n > engine.max_body_bytes:
                engine.stats.record_error()
                # drain in bounded chunks (never buffering the oversized
                # body) so the client sees a clean 413 instead of a reset
                # pipe mid-upload
                left = n
                while left > 0:
                    got = self.rfile.read(min(left, 1 << 16))
                    if not got:
                        break
                    left -= len(got)
                self._send(413, {"error": f"body {n} bytes exceeds limit "
                                          f"{engine.max_body_bytes}"})
                return
            try:
                self._send(200, engine.predict(self.rfile.read(n)))
            except ValueError as e:  # undecodable/garbage image payloads
                self._send(400, {"error": str(e)})
            except TimeoutError as e:  # wedged dispatch — retryable
                self._send(503, {"error": str(e)})
            except Exception as e:  # anything else is ours, not theirs
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact", required=True)
    ap.add_argument("--size", type=int, required=True,
                    help="network input size the artifact was exported at")
    ap.add_argument("--preprocess", choices=["resize", "letterbox"],
                    default="letterbox")
    ap.add_argument("--names", default="", help="class-names file")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--platform", default=None,
                    help="cpu|tpu (default: environment backend)")
    ap.add_argument("--max-batch", type=int, default=1,
                    help="micro-batching: coalesce up to N concurrent "
                         "requests into one padded device dispatch")
    ap.add_argument("--window-ms", type=float, default=5.0,
                    help="micro-batching window after the first arrival")
    ap.add_argument("--max-body-bytes", type=int, default=20 << 20,
                    help="reject request bodies larger than this (413)")
    ap.add_argument("--request-timeout-s", type=float, default=30.0,
                    help="socket + micro-batch dispatch timeout")
    args = ap.parse_args()
    setup_platform(args.platform)

    names = load_names(args.names) if args.names else []
    engine = Engine(args.artifact, args.size, args.preprocess, names,
                    max_batch=args.max_batch, window_ms=args.window_ms,
                    max_body_bytes=args.max_body_bytes,
                    timeout_s=args.request_timeout_s)
    # compile/warm once so the first request isn't a 30s surprise
    engine.predict(cv2.imencode(
        ".jpg", np.zeros((args.size, args.size, 3), np.uint8))[1].tobytes())
    server = ThreadingHTTPServer((args.host, args.port), make_handler(engine))
    # graceful shutdown: SIGTERM/SIGINT stop accepting, in-flight requests
    # finish (ThreadingHTTPServer joins non-daemon semantics via shutdown),
    # final stats go to stdout for the log collector
    import signal

    def _stop(*_):
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _stop)
    signal.signal(signal.SIGINT, _stop)
    print(f"serving {engine.info()} on http://{args.host}:{args.port}")
    server.serve_forever()
    print(f"shutdown; final stats: {json.dumps(engine.stats.snapshot())}")


if __name__ == "__main__":
    main()
