"""Predictor serving layer: bucketing, padding correctness, latency stats."""

import numpy as np

from gavit_tpu.config import from_dict
from gavit_tpu.serving import Predictor


def _predictor(buckets=(1, 4, 8)):
    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 1, "num_heads": 2,
                  "num_classes": 14,
                  "graph": {"enabled": True, "num_blocks": 1,
                            "adjacency": "knn", "k": 2}},
        "data": {"image_size": 16},
    })
    return Predictor(cfg, buckets=buckets)


def test_predict_shapes_and_range():
    p = _predictor()
    imgs = np.random.default_rng(0).integers(0, 255, (3, 16, 16, 3), np.uint8)
    probs = p.predict_proba(imgs)
    assert probs.shape == (3, 14)
    assert (probs >= 0).all() and (probs <= 1).all()


def test_padding_does_not_change_results():
    """A request of size 3 runs in the 4-bucket; results must equal an
    unpadded run sample-for-sample."""
    p = _predictor()
    imgs = np.random.default_rng(1).integers(0, 255, (8, 16, 16, 3), np.uint8)
    full = p.predict_proba(imgs)  # exactly the 8 bucket
    part = p.predict_proba(imgs[:3])  # padded 3 → 4
    np.testing.assert_allclose(part, full[:3], atol=1e-5)


def test_oversized_request_chunks():
    p = _predictor(buckets=(1, 4))
    imgs = np.random.default_rng(2).integers(0, 255, (10, 16, 16, 3), np.uint8)
    probs = p.predict_proba(imgs)
    assert probs.shape == (10, 14)
    ref = p.predict_proba(imgs[4:8])
    np.testing.assert_allclose(probs[4:8], ref, atol=1e-5)


def test_single_image_and_3d_input():
    p = _predictor()
    img = np.random.default_rng(3).integers(0, 255, (16, 16, 3), np.uint8)
    probs = p.predict_proba(img)
    assert probs.shape == (1, 14)


def test_predict_labels_and_latency_stats():
    p = _predictor()
    imgs = np.random.default_rng(4).integers(0, 255, (2, 16, 16, 3), np.uint8)
    labels = p.predict_labels(imgs, threshold=0.0)  # everything predicted
    assert len(labels) == 2 and len(labels[0]) == 14
    labels_none = p.predict_labels(imgs, threshold=1.1)
    assert labels_none[0] == []
    # the HTTP handler derives labels from probs already in hand — one
    # shared implementation, same result
    assert p.labels_from_probs(p.predict_proba(imgs), 0.0) == labels
    stats = p.latency_stats()
    assert stats["count"] >= 2 and stats["p50_ms"] > 0


def test_warmup_compiles_buckets():
    p = _predictor(buckets=(1, 2))
    p.warmup()  # should not raise


def test_int8_predictor_end_to_end():
    """The recommended serving mode (--precision int8) must work through the
    Predictor: calibration builds the static-PTQ collection and predictions
    stay close to fp32 (dynamic PTQ pre-calibration also functional)."""
    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 1, "num_heads": 2,
                  "num_classes": 14,
                  "graph": {"enabled": True, "num_blocks": 1,
                            "adjacency": "knn", "k": 2}},
        "data": {"image_size": 16},
    })
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 255, (4, 16, 16, 3), np.uint8)

    ref = Predictor(cfg, buckets=(4,)).predict_proba(imgs)

    q = Predictor(cfg, buckets=(4,), precision="int8")
    dyn = q.predict_proba(imgs)                # dynamic PTQ path
    assert dyn.shape == (4, 14)
    q.calibrate(imgs)                          # switch to static scales
    stat = q.predict_proba(imgs)
    assert stat.shape == (4, 14)
    assert np.all((stat >= 0) & (stat <= 1))
    assert np.max(np.abs(stat - ref)) < 0.15   # quantisation, not garbage


def test_meshed_dp_serving_matches_single_device():
    """Predictor over a data mesh: buckets rounded to multiples of the data
    axis, batches sharded over 'data', probabilities identical to the
    single-device predictor with the same params."""
    import jax
    from gavit_tpu.config import MeshConfig
    from gavit_tpu.parallel.mesh import make_mesh

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 1, "num_heads": 2,
                  "num_classes": 14,
                  "graph": {"enabled": True, "num_blocks": 1,
                            "adjacency": "knn", "k": 2}},
        "data": {"image_size": 16},
    })
    single = Predictor(cfg, buckets=(1, 4, 8))
    params = jax.device_get(single.params)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    meshed = Predictor(cfg, buckets=(1, 4, 8), params=params, mesh=mesh)
    assert meshed.buckets == (8,)  # rounded up to the data-axis multiple

    imgs = np.random.default_rng(0).integers(0, 255, (11, 16, 16, 3),
                                             np.uint8)
    np.testing.assert_allclose(
        meshed.predict_proba(imgs), single.predict_proba(imgs), atol=1e-6
    )


def test_meshed_tp_serving_params_sharded_and_match():
    """Serving with a >1 'model' axis: params live Megatron-sharded (the
    over-HBM-model case) and the head-partitioned fused kernels reproduce
    the single-device probabilities."""
    import jax
    from gavit_tpu.config import MeshConfig
    from gavit_tpu.parallel.mesh import make_mesh

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 1, "num_heads": 2,
                  "num_classes": 14,
                  "graph": {"enabled": True, "num_blocks": 1,
                            "adjacency": "knn", "k": 2}},
        "data": {"image_size": 16},
    })
    single = Predictor(cfg, buckets=(4,))
    params = jax.device_get(single.params)
    mesh = make_mesh(MeshConfig(data=4, model=2))
    meshed = Predictor(cfg, buckets=(4,), params=params, mesh=mesh)
    qkv = meshed.params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert "model" in str(qkv.sharding.spec)
    assert qkv.addressable_shards[0].data.shape[1] == qkv.shape[1] // 2

    imgs = np.random.default_rng(1).integers(0, 255, (4, 16, 16, 3),
                                             np.uint8)
    np.testing.assert_allclose(
        meshed.predict_proba(imgs), single.predict_proba(imgs), atol=1e-6
    )


def test_meshed_tp_int8_serving_matches_single_device():
    """Static-PTQ int8 under a dp×tp mesh: calibration runs on the
    Megatron-sharded params and the quantised serve path reproduces the
    single-device int8 probabilities exactly."""
    from gavit_tpu.config import MeshConfig
    from gavit_tpu.parallel.mesh import make_mesh

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 1, "num_heads": 2,
                  "num_classes": 14,
                  "graph": {"enabled": True, "num_blocks": 1,
                            "adjacency": "knn", "k": 2}},
        "data": {"image_size": 16},
    })
    mesh = make_mesh(MeshConfig(data=4, model=2))
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 255, (8, 16, 16, 3), np.uint8)

    p1 = Predictor(cfg, buckets=(8,), precision="int8")
    p1.calibrate(imgs)
    ref = p1.predict_proba(imgs)

    pm = Predictor(cfg, buckets=(8,), precision="int8", mesh=mesh)
    pm.calibrate(imgs)
    out = pm.predict_proba(imgs)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_microbatcher_coalesces_concurrent_requests():
    """N concurrent single-image submits ride fewer device calls than N,
    and every caller gets exactly the rows a direct predict returns."""
    import threading

    from gavit_tpu.serving import MicroBatcher

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 1, "num_heads": 2,
                  "num_classes": 14},
        "data": {"image_size": 16},
    })
    pred = Predictor(cfg, buckets=(1, 8))
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (8, 16, 16, 3), np.uint8)
    ref = pred.predict_proba(imgs)
    pred.warmup()  # compiled shapes so flushes are fast vs the wait window

    calls = []
    orig = pred.predict_proba
    pred.predict_proba = lambda x: (calls.append(len(x)), orig(x))[1]

    batcher = MicroBatcher(pred, max_wait_ms=500.0)
    try:
        outs = [None] * 8

        def worker(i):
            outs[i] = batcher.submit(imgs[i])

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for i in range(8):
            np.testing.assert_allclose(outs[i][0], ref[i], atol=1e-6)
        stats = batcher.stats()
        assert stats["rows"] == 8
        assert stats["flushes"] < 8, stats  # coalescing actually happened
        assert stats["flushes"] == len(calls)
    finally:
        batcher.close()


def test_microbatcher_propagates_flush_errors():
    from gavit_tpu.serving import MicroBatcher

    class Boom:
        buckets = (4,)
        image_size = 16

        def predict_proba(self, x):
            raise RuntimeError("device on fire")

    batcher = MicroBatcher(Boom(), max_wait_ms=0.0)
    try:
        with np.testing.assert_raises(RuntimeError):
            batcher.submit(np.zeros((1, 16, 16, 3), np.uint8))
    finally:
        batcher.close()


def test_microbatcher_zero_wait_still_serves():
    """max_wait_ms=0: no added latency, each request still answered."""
    from gavit_tpu.serving import MicroBatcher

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 1, "num_heads": 2,
                  "num_classes": 14},
        "data": {"image_size": 16},
    })
    pred = Predictor(cfg, buckets=(1, 4))
    imgs = np.random.default_rng(1).integers(0, 255, (2, 16, 16, 3),
                                             np.uint8)
    ref = pred.predict_proba(imgs)
    batcher = MicroBatcher(pred, max_wait_ms=0.0)
    try:
        out = batcher.submit(imgs)
        np.testing.assert_allclose(out, ref, atol=1e-6)
    finally:
        batcher.close()


def test_microbatcher_bad_request_fails_only_its_caller():
    """A malformed request must be rejected at submit() — inside the flush
    it would poison every coalesced waiter — and submit after close()
    raises instead of hanging."""
    import threading

    from gavit_tpu.serving import MicroBatcher

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 1, "num_heads": 2,
                  "num_classes": 14},
        "data": {"image_size": 16},
    })
    pred = Predictor(cfg, buckets=(1, 4))
    good = np.zeros((1, 16, 16, 3), np.uint8)
    ref = pred.predict_proba(good)
    batcher = MicroBatcher(pred, max_wait_ms=50.0)
    try:
        out = [None]
        t = threading.Thread(
            target=lambda: out.__setitem__(0, batcher.submit(good)))
        t.start()
        with np.testing.assert_raises(ValueError):
            batcher.submit(np.zeros((1, 20, 20, 3), np.uint8))  # wrong size
        t.join(timeout=120)
        np.testing.assert_allclose(out[0], ref, atol=1e-6)
    finally:
        batcher.close()
    with np.testing.assert_raises(RuntimeError):
        batcher.submit(good)


def test_microbatcher_close_flushes_accepted_requests():
    """Requests accepted BEFORE close() must get results, not errors: a
    max-batch flush used to let the worker observe _closed and exit while
    accepted requests were still queued behind it."""
    import threading
    import time as _time

    from gavit_tpu.serving import MicroBatcher

    class SlowPred:
        buckets = (1,)
        image_size = 16

        def __init__(self):
            self.started = threading.Event()
            self.release = threading.Event()
            self.calls = []

        def predict_proba(self, x):
            self.calls.append(len(x))
            if len(self.calls) == 1:  # hold the first flush open
                self.started.set()
                self.release.wait(5)
            return np.ones((len(x), 14), np.float32)

    pred = SlowPred()
    batcher = MicroBatcher(pred, max_wait_ms=0.0, max_batch=1)
    img = np.zeros((1, 16, 16, 3), np.uint8)
    outs = [None] * 3

    def sub(i):
        try:
            outs[i] = batcher.submit(img)
        except Exception as e:  # noqa: BLE001 — the assert below reports it
            outs[i] = e

    threads = [threading.Thread(target=sub, args=(i,)) for i in range(3)]
    threads[0].start()
    assert pred.started.wait(5)
    threads[1].start()
    threads[2].start()
    _time.sleep(0.1)  # B and C enqueue (submit queues before blocking)
    closer = threading.Thread(target=batcher.close)
    closer.start()
    _time.sleep(0.1)  # close() has set _closed and queued the sentinel
    pred.release.set()
    for t in threads:
        t.join(5)
    closer.join(5)
    for i, out in enumerate(outs):
        assert isinstance(out, np.ndarray), f"request {i} got {out!r}"
    assert pred.calls == [1, 1, 1]
    # and a submit AFTER close still raises instead of hanging
    with np.testing.assert_raises(RuntimeError):
        batcher.submit(img)


def test_microbatcher_close_waits_out_slow_flush():
    """A flush that outlasts close()'s bounded join must NOT get its queued
    followers error-drained: the worker is alive and will reach the sentinel,
    so close() waits it out (only a dead worker forfeits queued requests)."""
    import threading
    import time as _time

    from gavit_tpu.serving import MicroBatcher

    class SlowPred:
        buckets = (1,)
        image_size = 16

        def __init__(self):
            self.started = threading.Event()
            self.release = threading.Event()
            self.calls = 0

        def predict_proba(self, x):
            self.calls += 1
            if self.calls == 1:  # outlast close()'s bounded join
                self.started.set()
                self.release.wait(10)
            return np.ones((len(x), 14), np.float32)

    pred = SlowPred()
    batcher = MicroBatcher(pred, max_wait_ms=0.0, max_batch=1)
    batcher._close_join_s = 0.05  # shrink the bounded join for the test
    img = np.zeros((1, 16, 16, 3), np.uint8)
    outs = [None] * 2

    def sub(i):
        try:
            outs[i] = batcher.submit(img)
        except Exception as e:  # noqa: BLE001 — the assert below reports it
            outs[i] = e

    threads = [threading.Thread(target=sub, args=(i,)) for i in range(2)]
    threads[0].start()
    assert pred.started.wait(5)
    threads[1].start()
    _time.sleep(0.1)  # request B enqueues behind the in-flight flush
    closer = threading.Thread(target=batcher.close)
    closer.start()
    _time.sleep(0.3)  # bounded join (0.05 s) has expired, flush still open
    assert closer.is_alive()  # close is waiting the worker out, not draining
    pred.release.set()
    for t in threads:
        t.join(5)
    closer.join(5)
    assert not closer.is_alive()
    for i, out in enumerate(outs):
        assert isinstance(out, np.ndarray), f"request {i} got {out!r}"
    assert pred.calls == 2


def test_microbatcher_empty_timeout_is_not_termination():
    """A submit racing close() can enqueue between the worker's get()
    timeout and its _closed read; an old fast-path returned on
    Empty+_closed, error-draining that accepted request.  The sentinel is
    the ONLY termination signal: with the closed flag already visible and
    the queue momentarily empty, the worker must keep draining and flush a
    late-but-accepted request that lands ahead of the sentinel."""
    import time as _time

    from gavit_tpu.serving import MicroBatcher

    class Pred:
        buckets = (1,)
        image_size = 16

        def __init__(self):
            self.calls = 0

        def predict_proba(self, x):
            self.calls += 1
            return np.ones((len(x), 14), np.float32)

    pred = Pred()
    batcher = MicroBatcher(pred, max_wait_ms=0.0, max_batch=1)
    # simulate the torn close() state the worker can observe: closed flag
    # set, queue empty, sentinel (and one accepted request before it) not
    # yet enqueued.  Give the worker >2 timeout cycles to (wrongly) exit.
    batcher._closed = True
    _time.sleep(0.3)
    assert batcher._worker.is_alive(), (
        "worker treated Empty+_closed as termination; a racing accepted "
        "request would be error-drained instead of flushed")
    # the racing request then lands, FIFO-ahead of close()'s sentinel
    import threading

    done = threading.Event()
    slot = [None]
    img = np.zeros((1, 16, 16, 3), np.uint8)
    batcher._q.put((img, done, slot))
    batcher._closed = False  # let the real close() run its normal path
    batcher.close()
    assert done.is_set()
    assert isinstance(slot[0], np.ndarray), f"request got {slot[0]!r}"
    assert pred.calls == 1


def test_stats_safe_under_concurrent_predicts():
    """/stats and /metrics scrape the latency window while handler threads
    append to it: iterating a deque mid-append raises 'deque mutated during
    iteration', and the lifetime counter is a non-atomic += . Hammer both
    sides concurrently and check the final counts are exact."""
    import threading

    from gavit_tpu import serving as srv
    from gavit_tpu.serving import MicroBatcher

    class Pred:
        buckets = (1,)
        image_size = 16

        def __init__(self):
            self._latencies_ms = srv._latency_window()
            self._latency_count = 0
            self._stats_lock = threading.Lock()

        latency_stats = srv.Predictor.latency_stats

        def predict_proba(self, x):
            srv._record_latency(self, 1.0)
            return np.ones((len(x), 14), np.float32)

    pred = Pred()
    batcher = MicroBatcher(pred, max_wait_ms=0.0, max_batch=1)
    img = np.zeros((1, 16, 16, 3), np.uint8)
    n_threads, n_each = 8, 50
    errs = []

    def clients():
        try:
            for _ in range(n_each):
                batcher.submit(img)
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    def scraper(stop):
        try:
            while not stop.is_set():
                pred.latency_stats()
                batcher.stats()
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    stop = threading.Event()
    scr = [threading.Thread(target=scraper, args=(stop,)) for _ in range(2)]
    cls = [threading.Thread(target=clients) for _ in range(n_threads)]
    for t in scr + cls:
        t.start()
    for t in cls:
        t.join(60)
    stop.set()
    for t in scr:
        t.join(10)
    batcher.close()
    assert not errs, errs[0]
    assert pred.latency_stats()["count"] == n_threads * n_each
    st = batcher.stats()
    assert st["rows"] == n_threads * n_each


def test_microbatcher_backpressure_queue_full():
    """Admission bound (r4): once queued+in-flight rows exceed
    max_queue_rows, submit raises QueueFull immediately (the serving layer
    maps it to 503 + Retry-After); capacity frees as flushes complete and
    admission resumes."""
    import threading

    from gavit_tpu.serving import MicroBatcher, QueueFull

    class SlowPred:
        buckets = (1,)
        image_size = 16

        def __init__(self):
            self.started = threading.Event()
            self.release = threading.Event()

        def predict_proba(self, x):
            self.started.set()
            self.release.wait(10)
            return np.ones((len(x), 14), np.float32)

    pred = SlowPred()
    batcher = MicroBatcher(pred, max_wait_ms=0.0, max_batch=1,
                           max_queue_rows=2)
    img = np.zeros((1, 16, 16, 3), np.uint8)
    outs = [None] * 2

    def sub(i):
        try:
            outs[i] = batcher.submit(img)
        except Exception as e:  # noqa: BLE001 — asserted below
            outs[i] = e

    # request A occupies the in-flight slot (blocked in predict_proba),
    # request B fills the last queued row: pending == bound == 2
    t0 = threading.Thread(target=sub, args=(0,))
    t0.start()
    assert pred.started.wait(5)
    t1 = threading.Thread(target=sub, args=(1,))
    t1.start()
    deadline = threading.Event()
    for _ in range(100):
        if batcher.stats()["pending_rows"] == 2:
            break
        deadline.wait(0.02)
    assert batcher.stats()["pending_rows"] == 2
    # request C is over the bound — rejected at admission, not queued
    with np.testing.assert_raises(QueueFull):
        batcher.submit(img)
    assert batcher.stats()["rejected"] == 1
    # draining the flushes frees capacity; admission resumes
    pred.release.set()
    t0.join(5)
    t1.join(5)
    assert isinstance(outs[0], np.ndarray) and isinstance(outs[1], np.ndarray)
    assert batcher.stats()["pending_rows"] == 0
    assert isinstance(batcher.submit(img), np.ndarray)
    batcher.close()


def test_moe_predictor_engines_agree():
    """The serving surface works for the MoE family: a Predictor over a
    grouped-engine MoE model serves the same probabilities as the dense
    engine on the same params (no-drop capacity), through the bucketed
    batch path."""
    base = {
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 2, "num_heads": 2,
                  "num_classes": 14,
                  "moe": {"enabled": True, "num_experts": 4, "k": 2,
                          "capacity_factor": 2.0, "every": 2}},
        "data": {"image_size": 16},
    }
    import copy

    cfg_d = from_dict(copy.deepcopy(base))
    grouped = copy.deepcopy(base)
    grouped["model"]["moe"]["impl"] = "grouped"
    cfg_g = from_dict(grouped)
    pd = Predictor(cfg_d, buckets=(1, 4))
    # same params on both engines (identical trees)
    pg = Predictor(cfg_g, buckets=(1, 4))
    pg.params = pd.params
    pg._variables = {"params": pd.params}
    imgs = np.random.default_rng(1).integers(0, 255, (3, 16, 16, 3), np.uint8)
    np.testing.assert_allclose(
        pg.predict_proba(imgs), pd.predict_proba(imgs), atol=1e-5)


def test_microbatcher_admits_oversized_request_when_idle():
    """A single request larger than max_queue_rows must be admitted when
    the batcher is idle (the predictor chunks it) — rejecting it would 503
    a permanently-unservable request forever."""
    from gavit_tpu.serving import MicroBatcher

    class Pred:
        buckets = (1,)
        image_size = 16

        def predict_proba(self, x):
            return np.ones((len(x), 14), np.float32)

    batcher = MicroBatcher(Pred(), max_wait_ms=0.0, max_batch=1,
                           max_queue_rows=2)
    big = np.zeros((5, 16, 16, 3), np.uint8)   # 5 rows > bound 2
    out = batcher.submit(big)
    assert out.shape == (5, 14)
    assert batcher.stats()["rejected"] == 0
    batcher.close()
