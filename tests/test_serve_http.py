"""HTTP serving endpoint: health, JSON predict, PNG predict, error surface."""

import io
import json
import sys
import threading
import urllib.error
import urllib.request

from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gavit_tpu.config import from_dict
from gavit_tpu.serving import Predictor
from scripts.serve import GavitHTTPServer, build_handler


@pytest.fixture(scope="module")
def server():
    cfg = from_dict({"model": {
        "name": "custom", "img_size": 16, "patch_size": 8, "embed_dim": 32,
        "depth": 1, "num_heads": 2, "num_classes": 14,
    }, "data": {"image_size": 16}})
    predictor = Predictor(cfg, buckets=(1, 4))
    srv = GavitHTTPServer(
        ("127.0.0.1", 0), build_handler(predictor, 16, "test-model")
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    return json.loads(urllib.request.urlopen(url, timeout=120).read())


def _post(url, data, ctype):
    req = urllib.request.Request(url, data=data,
                                 headers={"Content-Type": ctype})
    return json.loads(urllib.request.urlopen(req, timeout=300).read())


def test_healthz(server):
    r = _get(server + "/healthz")
    assert r["status"] == "ok" and r["image_size"] == 16


def test_json_predict(server):
    arr = np.random.default_rng(0).integers(0, 255, (2, 16, 16, 3)).tolist()
    r = _post(server + "/predict", json.dumps(arr).encode(),
              "application/json")
    assert len(r["probabilities"]) == 2
    assert len(r["probabilities"][0]) == 14
    assert len(r["disease_names"]) == 14


def test_png_predict_with_resize(server):
    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (64, 64), np.uint8),
        mode="L",
    ).save(buf, format="PNG")
    r = _post(server + "/predict", buf.getvalue(), "image/png")
    assert len(r["probabilities"]) == 1
    assert isinstance(r["labels"][0], list)


def test_garbage_body_returns_400(server):
    req = urllib.request.Request(server + "/predict", data=b"not an image",
                                 headers={"Content-Type": "image/png"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400


def test_oversized_body_rejected_413():
    """Bodies above --max-body-mb are refused BEFORE the read (an unbounded
    read would buffer an arbitrarily large body in serving-host memory)."""
    cfg = from_dict({"model": {
        "name": "custom", "img_size": 16, "patch_size": 8, "embed_dim": 32,
        "depth": 1, "num_heads": 2, "num_classes": 14,
    }, "data": {"image_size": 16}})
    predictor = Predictor(cfg, buckets=(1,))
    srv = GavitHTTPServer(
        ("127.0.0.1", 0),
        build_handler(predictor, 16, "test-model", max_body_bytes=16384),
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        req = urllib.request.Request(
            url + "/predict", data=b"x" * 32768,
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=60)
        assert e.value.code == 413
        # an in-limit request on a fresh connection still works
        arr = np.zeros((16, 16, 3), np.uint8).tolist()
        r = _post(url + "/predict", json.dumps(arr).encode(),
                  "application/json")
        assert len(r["probabilities"]) == 1
    finally:
        srv.shutdown()


def test_unknown_path_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(server + "/nope", timeout=60)
    assert e.value.code == 404


def test_stats_after_traffic(server):
    r = _get(server + "/stats")
    assert r.get("count", 0) >= 1


def test_prometheus_metrics_endpoint(server):
    body = urllib.request.urlopen(server + "/metrics", timeout=60).read()
    text = body.decode()
    assert "# TYPE gavit_requests_total counter" in text
    count = [ln for ln in text.splitlines()
             if ln.startswith("gavit_requests_total")]
    assert count and float(count[0].split()[1]) >= 1
    assert "gavit_latency_p50_ms" in text


def test_coalesced_server_concurrent_posts():
    """--coalesce-ms path: concurrent requests are answered correctly and
    /stats exposes the microbatch block."""
    from gavit_tpu.serving import MicroBatcher

    cfg = from_dict({"model": {
        "name": "custom", "img_size": 16, "patch_size": 8, "embed_dim": 32,
        "depth": 1, "num_heads": 2, "num_classes": 14,
    }, "data": {"image_size": 16}})
    predictor = Predictor(cfg, buckets=(1, 8))
    predictor.warmup()
    batcher = MicroBatcher(predictor, max_wait_ms=100.0)
    srv = GavitHTTPServer(
        ("127.0.0.1", 0),
        build_handler(predictor, 16, "test-model", batcher),
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        rng = np.random.default_rng(3)
        imgs = rng.integers(0, 255, (4, 16, 16, 3), np.uint8)
        ref = predictor.predict_proba(imgs)

        results = [None] * 4

        def post_one(i):
            arr = imgs[i].tolist()
            results[i] = _post(url + "/predict",
                               json.dumps(arr).encode(),
                               "application/json")

        threads = [threading.Thread(target=post_one, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        for i in range(4):
            np.testing.assert_allclose(
                np.asarray(results[i]["probabilities"][0]), ref[i],
                atol=1e-4)  # response rounds to 5 decimals
        stats = _get(url + "/stats")
        assert stats["microbatch"]["rows"] == 4
    finally:
        srv.shutdown()
        batcher.close()
