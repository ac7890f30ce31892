#!/usr/bin/env python
"""Time the full Trainer step at an arbitrary flagship-family config.

Same builder as tools/profile_train_step.py (synthetic batch, bf16, full
jitted donated step incl. device-side aug + AdamW); prints ms/step and
img/s/chip. Used for the r4 floor-closing experiments (ViT-L megakernel
VMEM cap, 384px batch sweep).

    JAX_PLATFORMS='' python tools/r4_step_bench.py --model vit_large_16 --batch 64
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from profile_train_step import build  # noqa: E402 — sibling tool module


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_base_16")
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--adjacency", default="knn")
    ap.add_argument("--moe", default="")
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()
    print(f"step bench {args.model} img={args.img} b{args.batch} "
          f"adj={args.adjacency} moe={args.moe or 'off'} "
          f"MLP_VMEM_MB={os.environ.get('GAVIT_MLP_VMEM_MB', '16')} "
          f"backend={jax.default_backend()}", flush=True)
    tr, batch = build(args.model, args.img, args.batch, args.adjacency,
                      args.moe)
    state = tr.state
    t0 = time.perf_counter()
    state, m, _ = tr._train_step(state, tr.base_rng, *batch)
    loss = float(m["loss"])  # sync (block_until_ready lies on the tunnel)
    print(f"compile+1st: {time.perf_counter() - t0:.0f}s loss {loss:.4f}",
          flush=True)
    for _ in range(3):  # warm
        state, m, _ = tr._train_step(state, tr.base_rng, *batch)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, m, _ = tr._train_step(state, tr.base_rng, *batch)
    _ = float(m["loss"])
    ms = (time.perf_counter() - t0) / args.steps * 1000
    print(f"train b{args.batch}: {ms:.1f} ms/step -> "
          f"{args.batch / ms * 1000:.0f} img/s/chip", flush=True)


if __name__ == "__main__":
    main()
