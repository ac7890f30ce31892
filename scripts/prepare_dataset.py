#!/usr/bin/env python
"""Pack a ChestX-ray14-style dataset into a zero-decode uint8 memmap.

Decodes + resizes every image ONCE (thread pool) into ``images.npy``
([N, S, S, 3] uint8 memmap) + ``labels.npy`` + ``meta.json``; training then
feeds at memcpy speed via ``PackedChestXrayDataset`` instead of paying
10–20 ms/image PNG decode in the hot loop.

    python scripts/prepare_dataset.py --image-dir <dir> --labels <list.txt> \
        --out <packed_dir> [--image-size 224] [--workers 16]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
from PIL import Image

from gavit_tpu.data.dataset import parse_label_file

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger(__name__)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image-dir", required=True)
    p.add_argument("--labels", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--workers", type=int, default=16)
    args = p.parse_args()

    paths, labels = parse_label_file(args.labels)
    n, s = len(paths), args.image_size
    os.makedirs(args.out, exist_ok=True)

    images = np.lib.format.open_memmap(
        os.path.join(args.out, "images.npy"), mode="w+",
        dtype=np.uint8, shape=(n, s, s, 3),
    )

    def pack_one(i):
        with Image.open(os.path.join(args.image_dir, paths[i])) as img:
            img = img.convert("RGB")
            if img.size != (s, s):
                img = img.resize((s, s), Image.BILINEAR)
            images[i] = np.asarray(img, np.uint8)
        return i

    done = 0
    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        for _ in pool.map(pack_one, range(n)):
            done += 1
            if done % 5000 == 0:
                logger.info(f"packed {done}/{n}")
    images.flush()

    np.save(os.path.join(args.out, "labels.npy"), labels)
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump({
            "image_size": s,
            "paths": [str(x) for x in paths],
            "source_image_dir": args.image_dir,
            "source_labels": args.labels,
        }, f)
    logger.info(
        f"Packed {n} images @ {s}px → {args.out} "
        f"({images.nbytes / 1e9:.2f} GB)"
    )


if __name__ == "__main__":
    main()
