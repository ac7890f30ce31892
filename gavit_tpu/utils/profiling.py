"""Tracing / profiling utilities (SURVEY §5: the reference has only tqdm
postfix timing; this is the TPU-native observability layer).

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing
  Perfetto-compatible traces for single steps or whole epochs.
* ``ThroughputMeter`` — sustained images/sec/chip with warmup skip; the
  north-star metric reported by ``bench.py`` and the trainer logs.
* ``step_timer`` — wall-clock per-step timer that forces a real device sync
  by fetching a scalar (``jax.block_until_ready`` does not block through
  remote-tunnel backends — measured on this machine).
* ``nan_guard`` — enables jax_debug_nans for CI runs (the race-detector /
  sanitizer analogue for a functional runtime).
"""

from __future__ import annotations

import contextlib
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace viewable in Perfetto/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"Profiler trace written to {logdir}")


def sync(x) -> float:
    """True device sync: reduce to a scalar and fetch it."""
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(jnp.ravel(leaf)[:1]))


class ThroughputMeter:
    """Sustained throughput with warmup exclusion."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self._count = 0
        self._images = 0
        self._start = None

    def step(self, batch_size: int):
        self._count += 1
        if self._count == self.warmup_steps:
            self._start = time.perf_counter()
            self._images = 0
        elif self._count > self.warmup_steps:
            self._images += batch_size

    @property
    def images_per_sec(self) -> float:
        if self._start is None or self._images == 0:
            return 0.0
        return self._images / (time.perf_counter() - self._start)

    def images_per_sec_per_chip(self) -> float:
        return self.images_per_sec / max(1, jax.device_count())


@contextlib.contextmanager
def step_timer(name: str, result=None):
    t0 = time.perf_counter()
    yield
    if result is not None:
        sync(result)
    logger.info(f"{name}: {(time.perf_counter() - t0) * 1000:.1f} ms")


@contextlib.contextmanager
def nan_guard(enable: bool = True):
    """Debug-NaN mode for CI (functional analogue of a sanitizer run)."""
    if not enable:
        yield
        return
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def percentile_latency(fn, args, n_iters: int = 50, percentiles=(50, 95, 99)):
    """Latency distribution of a jitted callable (ms)."""
    out = fn(*args)
    sync(out)
    times = []
    for _ in range(n_iters):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        times.append((time.perf_counter() - t0) * 1000)
    return {f"p{p}": float(np.percentile(times, p)) for p in percentiles}
