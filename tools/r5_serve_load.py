#!/usr/bin/env python
"""Serving load test that isolates the micro-batcher from the 1-core host
(VERDICT r4 #6).

The r4 HTTP burst bench put closed-loop socket clients AND handler threads
on this box's single core, so direct vs coalesced tied and the batcher's
crossover was unlocatable. This harness removes the host from the loop:

* the REAL ``MicroBatcher`` runs against a **fake predictor** that sleeps
  the per-bucket device latencies (measured on the TPU in-run when one is
  present; recorded r5 defaults otherwise) behind a lock that serializes
  calls exactly like the chip does;
* an **open-loop generator** fires single-image requests at a fixed
  offered rate from a scheduler thread (no sockets, no closed-loop
  back-pressure hiding the queueing behavior);
* phases sweep the offered rate for direct (one device call per request)
  vs coalesced (MicroBatcher, max_wait 2 ms) and report achieved
  throughput, p50/p95/p99 latency and shed (QueueFull) counts;
* a final **overload phase** scales the latency table ×20 so a 1-core
  generator can exceed capacity, validating the admission bound: sheds
  instead of unbounded queueing, accepted-tail bounded.

Run detached: nohup python tools/r5_serve_load.py >> logs/r5_serve_load.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("GAVIT_PLATFORM", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

# per-bucket device-resident latencies, ms (ViT-B/16+graph2 bf16, single
# v5e — refreshed in-run when a TPU is present)
DEFAULT_LAT = {1: 5.2, 2: 5.5, 4: 6.0, 8: 7.0, 16: 9.1, 32: 12.9, 64: 18.3}
IMG = 8


class FakePredictor:
    """Duck-typed Predictor: sleeps the recorded bucket latency behind a
    device lock (calls serialize, like the chip)."""

    def __init__(self, lat_ms: dict[int, float]):
        self.buckets = sorted(lat_ms)
        self.lat = dict(lat_ms)
        self.image_size = IMG
        self._dev = threading.Lock()

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def predict_proba(self, images: np.ndarray) -> np.ndarray:
        n = images.shape[0]
        with self._dev:
            left = n
            while left > 0:  # bucketed chunks, like the real Predictor
                b = self._bucket(left)
                time.sleep(self.lat[b] / 1000.0)
                left -= min(left, b)
        return np.zeros((n, 14), np.float32)


def run_phase(predictor, *, rate: float, n_req: int, coalesce: bool,
              max_wait_ms: float = 2.0):
    from gavit_tpu.serving import MicroBatcher, QueueFull

    img = np.zeros((1, IMG, IMG, 3), np.uint8)
    lat, shed = [], [0]
    lock = threading.Lock()
    batcher = (MicroBatcher(predictor, max_wait_ms=max_wait_ms)
               if coalesce else None)

    def serve_one():
        t0 = time.perf_counter()
        try:
            if batcher is not None:
                batcher.submit(img)
            else:
                predictor.predict_proba(img)
        except QueueFull:
            with lock:
                shed[0] += 1
            return
        dt = (time.perf_counter() - t0) * 1000
        with lock:
            lat.append(dt)

    threads = []
    t_start = time.perf_counter()
    for i in range(n_req):
        target = t_start + i / rate
        now = time.perf_counter()
        if target > now:
            time.sleep(target - now)
        th = threading.Thread(target=serve_one, daemon=True)
        th.start()
        threads.append(th)
    for th in threads:
        th.join(timeout=120)
    wall = time.perf_counter() - t_start
    stats = batcher.stats() if batcher is not None else {}
    if batcher is not None:
        batcher.close()
    arr = np.asarray(sorted(lat)) if lat else np.asarray([float("nan")])
    mode = "coalesce" if coalesce else "direct"
    print(f"  [{mode}] rate={rate:g}/s done={len(lat)}/{n_req} "
          f"shed={shed[0]} thru={len(lat) / wall:.1f}/s "
          f"p50={np.percentile(arr, 50):.1f} p95={np.percentile(arr, 95):.1f} "
          f"p99={np.percentile(arr, 99):.1f} ms "
          f"mean_batch={stats.get('mean_batch', 1):.1f}", flush=True)
    return {"mode": mode, "rate": rate, "done": len(lat), "shed": shed[0],
            "thru": len(lat) / wall,
            "p95": float(np.percentile(arr, 95))}


def measure_tpu_latencies() -> dict[int, float] | None:
    import jax

    if jax.default_backend() != "tpu":
        return None
    import jax.numpy as jnp

    from gavit_tpu.config import from_dict
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.ops.preprocess import val_preprocess

    cfg = from_dict({
        "model": {"name": "vit_base_16", "img_size": 224, "patch_size": 16,
                  "num_classes": 14, "drop_rate": 0.0,
                  "graph": {"enabled": True, "num_blocks": 2,
                            "adjacency": "knn", "k": 8}},
    })
    model = build_model(cfg.model, precision="bf16")
    params = init_params(model, jax.random.key(0))

    @jax.jit
    def infer(p, u8):
        x = val_preprocess(u8)
        return jax.nn.sigmoid(model.apply({"params": p}, x,
                                          deterministic=True))

    rng = np.random.default_rng(0)
    out = {}
    for b in (1, 2, 4, 8, 16, 32, 64):
        u8 = jnp.asarray(rng.integers(0, 256, (b, 224, 224, 3), np.uint8))
        probs = infer(params, u8)
        _ = float(jnp.sum(probs))          # compile + sync
        reps = 30
        t0 = time.perf_counter()
        for _ in range(reps):
            probs = infer(params, u8)
        _ = float(jnp.sum(probs))
        out[b] = (time.perf_counter() - t0) / reps * 1000
        print(f"  measured bucket {b}: {out[b]:.2f} ms", flush=True)
    return out


def main():
    import gavit_tpu

    gavit_tpu.setup_compilation_cache()
    lat = measure_tpu_latencies()
    src = "measured-on-TPU" if lat else "recorded-default"
    lat = lat or DEFAULT_LAT
    print(f"bucket latencies ({src}): "
          f"{ {k: round(v, 2) for k, v in lat.items()} }", flush=True)

    fake = FakePredictor(lat)
    cap_direct = 1000.0 / lat[1]
    cap_batch = 64 * 1000.0 / lat[64]
    print(f"model capacities: direct {cap_direct:.0f}/s, "
          f"b64-coalesced {cap_batch:.0f}/s", flush=True)

    print("== rate sweep (open-loop, in-process) ==", flush=True)
    results = []
    for rate in (20, 50, 100, 150, 250, 400):
        n = int(min(600, rate * 6))
        for coalesce in (False, True):
            results.append(run_phase(fake, rate=rate, n_req=n,
                                     coalesce=coalesce))
    cross = None
    for rate in (20, 50, 100, 150, 250, 400):
        d = next(r for r in results
                 if r["rate"] == rate and r["mode"] == "direct")
        c = next(r for r in results
                 if r["rate"] == rate and r["mode"] == "coalesce")
        if c["p95"] < d["p95"] * 0.8 or c["thru"] > d["thru"] * 1.1:
            cross = rate
            break
    print(f"CROSSOVER: micro-batcher wins from ~{cross}/s offered "
          f"(direct capacity {cap_direct:.0f}/s)", flush=True)

    print("== overload phase (latencies x20 -> capacity "
          f"{cap_batch / 20:.0f}/s, offered 400/s, 128-thread-class "
          "concurrency) ==", flush=True)
    slow = FakePredictor({k: v * 20 for k, v in lat.items()})
    r = run_phase(slow, rate=400, n_req=1200, coalesce=True)
    ok = r["shed"] > 0 and r["done"] > 0 and r["p95"] < 20000
    print(f"admission bound under overload: shed={r['shed']} "
          f"accepted_p95={r['p95']:.0f} ms bounded={'OK' if ok else 'FAIL'}",
          flush=True)


if __name__ == "__main__":
    main()
