"""tools/serve.py HTTP serving demo: artifact -> live endpoint -> JSON
detections (batch-1 requests, preprocessing inverse applied)."""

import json
import os
import sys
import threading
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
