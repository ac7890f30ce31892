#!/usr/bin/env python
"""Input-pipeline throughput, isolated from the device.

VERDICT r2 weak #5: CLI throughput ran 4-19% below bench.py's
device-resident number and the gap was *attributed* to this machine's
40 MB/s tunnel H2D without a measurement isolating the host pipeline. This
tool measures the loader chain alone — dataset decode → collate → (optional)
per-process shard — in images/sec on the host, so the claim "the input
pipeline is not the bottleneck on real TPU hardware" is a number, not an
assertion: compare the host rate here against the chip's img/s from
bench.py (the pipeline keeps up iff loader_rate >= chip_rate).

Usage:
  python tools/bench_loader.py --tier synthetic [--batch 128] [--epochs 3]
  python tools/bench_loader.py --tier packed --pack /path/prefix
  python tools/bench_loader.py --tier files --image-dir d/ --labels f.txt
  python tools/bench_loader.py --tier grain --image-dir d/ --labels f.txt
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tier", choices=["synthetic", "packed", "files",
                                      "grain"], default="synthetic")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--size", type=int, default=2048,
                   help="synthetic dataset size")
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--pack", default="", help="packed-memmap path prefix")
    p.add_argument("--image-dir", default="")
    p.add_argument("--labels", default="")
    args = p.parse_args()

    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset

    # dataset: whichever source was given (tier picks the LOADER)
    if args.pack:
        from gavit_tpu.data.dataset import PackedChestXrayDataset

        ds = PackedChestXrayDataset(args.pack)
    elif args.image_dir:
        from gavit_tpu.data.dataset import ChestXrayDataset

        ds = ChestXrayDataset(args.image_dir, args.labels,
                              image_size=args.image_size)
    else:
        ds = SyntheticChestXrayDataset(size=args.size,
                                       image_size=args.image_size)

    if args.tier == "grain":
        from gavit_tpu.data.grain_pipeline import GrainLoader

        loader = GrainLoader(ds, args.batch, shuffle=True,
                             num_workers=args.workers, seed=0)
    else:
        loader = DataLoader(ds, args.batch, shuffle=True,
                            num_workers=args.workers)

    # warm one epoch (page cache, worker spin-up), then measure
    n = 0
    for images, labels in loader:
        n += images.shape[0]
    t0 = time.perf_counter()
    n = 0
    for _ in range(args.epochs):
        for images, labels in loader:
            n += images.shape[0]
    dt = time.perf_counter() - t0
    rate = n / dt
    print(f"tier={args.tier} batch={args.batch} workers={args.workers} "
          f"image_size={args.image_size}: {rate:,.0f} img/s host "
          f"({n} images in {dt:.2f}s)")
    print("compare: bench.py chip rate (the pipeline keeps up iff "
          "host rate >= chip rate; this machine's tunnel H2D is the "
          "separate, measured 40 MB/s bottleneck — BASELINE.md)")


if __name__ == "__main__":
    main()
