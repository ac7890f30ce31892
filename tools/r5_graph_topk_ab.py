#!/usr/bin/env python
"""A/B the chunked graph path's kNN selection on TPU: lax.top_k (sort
lowering) vs k leftmost-max extraction passes, plus a mode=dense timing to
bound the selection cost (the r5 N=4097 fwd ran at ~2% MFU — hypothesis:
top_k dominates).

Run detached: nohup python tools/r5_graph_topk_ab.py >> logs/r5_graph_topk.log 2>&1 &
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
    from gavit_tpu.ops.graph_ops import graph_aggregate_chunked

    on_tpu = jax.default_backend() == "tpu"
    d = 768 if on_tpu else 64
    reps = 20 if on_tpu else 2
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    sizes = ((1025, 8), (4097, 2)) if on_tpu else ((129, 2),)
    print(f"graph topk A/B backend={jax.default_backend()}", flush=True)

    for n, b in sizes:
        t = jnp.asarray(rng.standard_normal((b, n, d)), dtype)
        v = jnp.asarray(rng.standard_normal((b, n, d)), dtype)
        for label, mode, impl in (("dense(no-select)", "dense", "topk"),
                                  ("knn/topk", "knn", "topk"),
                                  ("knn/iter", "knn", "iter")):
            os.environ["GAVIT_GRAPH_TOPK"] = impl

            @jax.jit
            def fwd(t, v, _mode=mode):
                return graph_aggregate_chunked(t, v, _mode, 8)

            out = fwd(t, v)
            _ = float(jnp.sum(out.astype(jnp.float32)))
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fwd(t, v)
            _ = float(jnp.sum(out.astype(jnp.float32)))
            ms = (time.perf_counter() - t0) / reps * 1000
            print(f"N={n} b={b} {label}: {ms:.2f} ms/call "
                  f"({ms / b * 1000:.0f} us/img)", flush=True)
        if on_tpu:
            # numerics: iter == topk on hardware
            os.environ["GAVIT_GRAPH_TOPK"] = "topk"
            r = np.asarray(jax.jit(lambda t, v: graph_aggregate_chunked(
                t, v, "knn", 8))(t, v), np.float32)
            os.environ["GAVIT_GRAPH_TOPK"] = "iter"
            o = np.asarray(jax.jit(lambda t, v: graph_aggregate_chunked(
                t, v, "knn", 8))(t, v), np.float32)
            print(f"N={n} iter-vs-topk max err {np.abs(r - o).max():.2e}",
                  flush=True)
    os.environ.pop("GAVIT_GRAPH_TOPK", None)


if __name__ == "__main__":
    main()
