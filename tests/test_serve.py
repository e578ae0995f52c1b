"""tools/serve.py HTTP serving demo: artifact -> live endpoint -> JSON
detections (batch-1 requests, preprocessing inverse applied)."""

import json
import os
import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

CFG = {
    "model": "yolov4-tiny",
    "num_classes": 3,
    "input_size": 64,
    "in_channels": 3,
    "compute_dtype": "float32",
    "anchors": [[4, 5], [6, 8], [10, 9], [12, 16], [18, 14],
                [20, 24], [32, 28], [40, 44], [56, 52]],
    # untrained head: keep the filter permissive so detections exist
    "conf_threshold": 0.1,
}


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    from podtpu.export.stablehlo import export_serving
    from podtpu.models import YoloV4Tiny

    model = YoloV4Tiny(num_classes=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    path = str(tmp_path_factory.mktemp("serve") / "serve.stablehlo")
    export_serving(model, variables, CFG, (1, 64, 64, 3), path)
    return path


def test_serve_endpoint(artifact):
    import cv2

    from serve import Engine, make_handler

    engine = Engine(artifact, 64, "letterbox", ["a", "b", "c"])
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        info = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=60).read())
        assert info["input_size"] == 64 and info["preprocess"] == "letterbox"

        try:  # unknown GET routes are 404, not silently-OK metadata
            urllib.request.urlopen(f"http://127.0.0.1:{port}/predict",
                                   timeout=60)
            assert False, "expected HTTP 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404

        # non-square image exercises the letterbox inverse
        img = np.random.default_rng(0).integers(
            0, 255, (100, 160, 3)).astype(np.uint8)
        body = cv2.imencode(".jpg", img)[1].tobytes()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body, method="POST")
        out = json.loads(urllib.request.urlopen(req, timeout=300).read())
        assert out["num_detections"] == len(out["detections"])
        for det in out["detections"]:
            assert det["class_name"] in ("a", "b", "c")
            assert 0.0 < det["confidence"] <= 1.0
            cx, cy, w, h = det["box_cxcywh_image"]
            assert w > 0 and h > 0
            # image-space boxes are in the 160x100 frame, not the 64 square
            assert cx < 200 and cy < 140

        # bad input -> 400 with an error payload
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=b"not an image",
            method="POST")
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "error" in json.loads(e.read())

        # liveness + metrics endpoints
        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=60).read())
        assert health == {"status": "ok"}
        stats = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=60).read())
        assert stats["requests"] == 1  # the good predict
        assert stats["errors"] == 1   # the bad-image 400
        assert stats["latency_ms"]["p50"] > 0
        assert stats["batch_fill"] is None  # no micro-batching configured
    finally:
        server.shutdown()


def test_serve_micro_batching(tmp_path):
    """--max-batch coalescing: concurrent requests share padded device
    dispatches and every response matches the unbatched engine's."""
    import cv2

    from serve import Engine

    from podtpu.export.stablehlo import export_serving
    from podtpu.models import YoloV4Tiny

    model = YoloV4Tiny(num_classes=3)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    path = str(tmp_path / "dyn.stablehlo")
    export_serving(model, variables, CFG, (None, 64, 64, 3), path)

    plain = Engine(path, 64, "resize", ["a", "b", "c"])
    batched = Engine(path, 64, "resize", ["a", "b", "c"],
                     max_batch=4, window_ms=30.0)
    assert batched.info()["micro_batch"] == 4

    rng = np.random.default_rng(1)
    bodies = [cv2.imencode(".png", rng.integers(0, 255, (80, 90, 3))
                           .astype(np.uint8))[1].tobytes()
              for _ in range(6)]
    want = [plain.predict(b) for b in bodies]

    got = [None] * len(bodies)

    def hit(i):
        got[i] = batched.predict(bodies[i])

    threads = [threading.Thread(target=hit, args=(i,))
               for i in range(len(bodies))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert got == want
    # the fill histogram accounts for every coalesced image, and at least
    # one dispatch carried more than one request under concurrent load
    snap = batched.stats.snapshot()
    assert sum(n * c for n, c in
               ((int(k), v) for k, v in snap["batch_fill"].items())) == 6
    assert snap["mean_fill"] >= 1

    # a fixed-batch-1 artifact cannot micro-batch: clear error
    fixed = str(tmp_path / "b1.stablehlo")
    export_serving(model, variables, CFG, (1, 64, 64, 3), fixed)
    with pytest.raises(ValueError, match="symbolic-batch"):
        Engine(fixed, 64, "resize", [], max_batch=4)


def test_serve_error_paths(artifact):
    """Fuzz the request surface: truncated JPEG, garbage bytes, oversized
    body, empty body, bad/missing Content-Length — each maps to its status
    code, increments the error counter, and never wedges the server."""
    import http.client

    import cv2

    from serve import Engine, make_handler

    engine = Engine(artifact, 64, "resize", ["a", "b", "c"],
                    max_body_bytes=1 << 20)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    def post(body: bytes) -> int:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=body, method="POST")
        try:
            urllib.request.urlopen(req, timeout=60)
            return 200
        except urllib.error.HTTPError as e:
            assert "error" in json.loads(e.read())
            return e.code

    try:
        img = np.random.default_rng(0).integers(
            0, 255, (64, 64, 3)).astype(np.uint8)
        good = cv2.imencode(".jpg", img)[1].tobytes()

        assert post(good[: len(good) // 2]) == 400   # truncated JPEG
        assert post(b"\x00" * 512) == 400            # garbage bytes
        assert post(b"") == 400                      # empty body
        assert post(b"x" * (2 << 20)) == 413         # oversized body
        errors = 4

        # hand-rolled requests urllib can't produce
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.putrequest("POST", "/predict", skip_accept_encoding=True)
        conn.putheader("Content-Length", "banana")
        conn.endheaders()
        assert conn.getresponse().status == 400      # unparseable length
        conn.close()
        errors += 1

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.putrequest("POST", "/predict", skip_accept_encoding=True)
        conn.endheaders()                            # no Content-Length
        assert conn.getresponse().status == 411
        conn.close()

        # the server still serves after the fuzz barrage
        assert post(good) == 200
        snap = engine.stats.snapshot()
        assert snap["errors"] == errors
        assert snap["requests"] == 1
    finally:
        server.shutdown()


def test_micro_batcher_timeout():
    """A wedged device dispatch surfaces as TimeoutError (503), not a hang."""
    from serve import MicroBatcher

    def stuck_run(x):
        time.sleep(60)

    mb = MicroBatcher(stuck_run, batch=2, window_ms=1.0, timeout_s=0.3)
    t0 = time.monotonic()
    with pytest.raises(TimeoutError):
        mb.submit(np.zeros((4, 4, 3), np.float32))
    assert time.monotonic() - t0 < 5
