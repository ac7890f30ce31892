#!/usr/bin/env python
"""Online-serving benchmark: concurrent HTTP clients vs the micro-batcher.

Spins the real serve.py handler stack in-process (GavitHTTPServer +
Predictor), fires C concurrent closed-loop clients posting single images,
and reports request throughput + latency percentiles — once without
coalescing (each request pays its own device call) and once with
--coalesce-ms style micro-batching. The delta is the MicroBatcher's win.

    GAVIT_PLATFORM=cpu python tools/bench_serve.py            # tiny, CPU
    PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_serve.py  # TPU
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("GAVIT_PLATFORM", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import numpy as np


def run_load(url: str, img, clients: int, requests_each: int):
    body = json.dumps(img.tolist()).encode()
    lat: list[float] = []
    resets, shed = [0], [0]
    lock = threading.Lock()

    def client():
        for _ in range(requests_each):
            t0 = time.perf_counter()
            req = urllib.request.Request(
                url + "/predict", data=body,
                headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(req, timeout=600).read()
            except urllib.error.HTTPError as e:
                # 503 = the micro-batcher's admission bound shed the request
                # (the graceful overload path; the r3 failure was a raw
                # connection reset from the too-shallow accept backlog)
                with lock:
                    if e.code == 503:
                        shed[0] += 1
                    else:
                        resets[0] += 1
                continue
            except (ConnectionError, urllib.error.URLError, OSError):
                with lock:
                    resets[0] += 1
                continue
            with lock:
                lat.append((time.perf_counter() - t0) * 1000)

    threads = [threading.Thread(target=client) for _ in range(clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    arr = np.asarray(lat if lat else [0.0])
    return {
        "req_per_s": round(len(lat) / wall, 1),
        "connection_resets": resets[0],
        "rejected_503": shed[0],
        "p50_ms": round(float(np.percentile(arr, 50)), 1),
        "p95_ms": round(float(np.percentile(arr, 95)), 1),
    }


def main():
    import gavit_tpu

    gavit_tpu.setup_compilation_cache()
    from gavit_tpu.config import from_dict
    from gavit_tpu.serving import MicroBatcher, Predictor
    from scripts.serve import GavitHTTPServer, build_handler

    on_tpu = jax.default_backend() == "tpu"
    img_size = 224 if on_tpu else 32
    name = "vit_base_16" if on_tpu else "custom"
    clients, reqs = (32, 8) if on_tpu else (8, 4)
    clients = int(os.environ.get("GAVIT_BENCH_CLIENTS", clients))

    cfg = from_dict({
        "model": ({"name": name, "img_size": img_size, "patch_size": 16,
                   "num_classes": 14,
                   "graph": {"enabled": True, "num_blocks": 2,
                             "adjacency": "knn", "k": 8, "dynamic": True}}
                  if on_tpu else
                  {"name": name, "img_size": img_size, "patch_size": 8,
                   "embed_dim": 64, "depth": 2, "num_heads": 2,
                   "num_classes": 14}),
        "data": {"image_size": img_size},
    })
    pred = Predictor(cfg, None,
                     precision="bf16" if on_tpu else "fp32",
                     buckets=(1, 8, 32, 64))
    pred.warmup()
    img = np.random.default_rng(0).integers(
        0, 255, (img_size, img_size, 3), np.uint8)

    results = {}
    for label, batcher in (
        ("direct", None),
        ("coalesce_5ms", MicroBatcher(pred, max_wait_ms=5.0, max_batch=64)),
    ):
        srv = GavitHTTPServer(
            ("127.0.0.1", 0), build_handler(pred, img_size, "bench",
                                            batcher))
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        run_load(url, img, 2, 2)  # warm the path
        results[label] = run_load(url, img, clients, reqs)
        if batcher is not None:
            results[label]["microbatch"] = batcher.stats()
            batcher.close()
        srv.shutdown()
        print(f"{label}: {results[label]}", flush=True)

    speedup = results["coalesce_5ms"]["req_per_s"] / max(
        results["direct"]["req_per_s"], 1e-9)
    print(json.dumps({"clients": clients, "speedup": round(speedup, 2),
                      **results}))


if __name__ == "__main__":
    main()
