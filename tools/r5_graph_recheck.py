#!/usr/bin/env python
"""Decisive interleaved recheck of the chunked-graph timings.

The r5 bigN probe measured chunked knn at N=1025 b8 = 6.06 ms/call while
the later top_k A/B measured 114.19 ms for nominally the same computation
(and dense mode SLOWER than knn, which is impossible if both were clean).
This probe times all variants interleaved in ONE process, with a sync
after EVERY call (no dispatch-queue pipelining across the timing loop),
3 rounds each, reporting per-round medians — session effects cannot hide.

Run detached: nohup python tools/r5_graph_recheck.py >> logs/r5_graph_recheck.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("GAVIT_PLATFORM", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import gavit_tpu

    gavit_tpu.setup_compilation_cache()
    from gavit_tpu.ops.graph_ops import (fused_graph_aggregate,
                                         graph_aggregate_chunked)

    on_tpu = jax.default_backend() == "tpu"
    d = 768 if on_tpu else 64
    reps = 10 if on_tpu else 2
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    rng = np.random.default_rng(0)
    sizes = ((1025, 8), (4097, 2)) if on_tpu else ((129, 2),)
    print(f"graph recheck backend={jax.default_backend()}", flush=True)

    for n, b in sizes:
        t = jnp.asarray(rng.standard_normal((b, n, d)), dtype)
        v = jnp.asarray(rng.standard_normal((b, n, d)), dtype)

        variants = {}

        def add(name, fn, env=None):
            if env:
                os.environ["GAVIT_GRAPH_TOPK"] = env
            else:
                os.environ.pop("GAVIT_GRAPH_TOPK", None)
            j = jax.jit(fn)
            out = j(t, v)                      # compile
            _ = float(jnp.sum(out.astype(jnp.float32)))
            variants[name] = j

        add("dispatcher(knn)", lambda t, v: fused_graph_aggregate(
            t, v, "knn", 8))
        add("chunked-knn/topk", lambda t, v: graph_aggregate_chunked(
            t, v, "knn", 8), env="topk")
        add("chunked-knn/iter", lambda t, v: graph_aggregate_chunked(
            t, v, "knn", 8), env="iter")
        add("chunked-dense", lambda t, v: graph_aggregate_chunked(
            t, v, "dense"))
        os.environ.pop("GAVIT_GRAPH_TOPK", None)

        for rnd in range(3):
            for name, j in variants.items():
                # batched loop + one sync (comparable to the prior probes);
                # interleaved rounds expose any session drift
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = j(t, v)
                _ = float(jnp.sum(out.astype(jnp.float32)))
                ms = (time.perf_counter() - t0) / reps * 1000
                print(f"N={n} b={b} r{rnd} {name}: {ms:.2f} ms/call",
                      flush=True)


if __name__ == "__main__":
    main()
