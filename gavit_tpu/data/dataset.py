"""NIH ChestX-ray14 dataset.

Same on-disk contract as the reference (``/root/reference/src/data/dataset.py``):
a space-delimited label file whose first column is the image filename and
columns 1..14 are float disease labels (``dataset.py:39-41``), images loaded
from ``image_dir`` and converted to RGB (``dataset.py:79-80``), per-class
positive weights = neg/pos counts (``dataset.py:59-64``), and the fixed
14-disease name list (``dataset.py:47-51``).

TPU-native difference: ``__getitem__`` returns a **uint8 HWC** array resized
to the training resolution — all float math (normalise, augment) runs on
device inside the jitted step (see ``gavit_tpu/ops/preprocess.py``), and the
host→device transfer ships 4× fewer bytes than fp32 tensors.
"""

from __future__ import annotations

import logging
import os

import numpy as np
from PIL import Image

logger = logging.getLogger(__name__)

DISEASE_NAMES = [
    "Atelectasis", "Cardiomegaly", "Effusion", "Infiltration",
    "Mass", "Nodule", "Pneumonia", "Pneumothorax", "Consolidation",
    "Edema", "Emphysema", "Fibrosis", "Pleural_Thickening", "Hernia",
]

NUM_CLASSES = len(DISEASE_NAMES)


def parse_label_file(label_file: str):
    """Parse the space-delimited label format → (paths, labels [N,14])."""
    paths, labels = [], []
    with open(label_file) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            paths.append(parts[0])
            row = [float(v) for v in parts[1:15]]
            if len(row) != NUM_CLASSES:
                raise ValueError(
                    f"label line for {parts[0]!r} has {len(row)} labels, "
                    f"expected {NUM_CLASSES}"
                )
            labels.append(row)
    if not paths:
        raise ValueError(f"empty label file: {label_file}")
    return np.asarray(paths), np.asarray(labels, np.float32)


def class_weights_from_labels(labels: np.ndarray) -> np.ndarray:
    """Per-class pos_weight = negative/positive counts (``dataset.py:59-64``).

    Classes with ZERO positives fall back to weight 1.0 (with a warning)
    instead of the reference's ``inf`` — on a split where a rare disease
    (e.g. Hernia, 227/112k in NIH) has no positive example, an infinite
    pos_weight turns the first validation positive into an inf WBCE term and
    NaN epoch metrics. SURVEY §0.5: match intended behavior, not defects.
    """
    pos = labels.sum(axis=0)
    neg = len(labels) - pos
    w = np.where(pos > 0, neg / np.maximum(pos, 1.0), 1.0)
    if (pos == 0).any():
        degenerate = [
            DISEASE_NAMES[i] if i < len(DISEASE_NAMES) else str(i)
            for i in np.flatnonzero(pos == 0)
        ]
        logger.warning(
            "classes with zero positive samples get pos_weight=1.0 "
            f"(reference would produce inf): {degenerate}"
        )
    return w.astype(np.float32)


class ChestXrayDataset:
    """Map-style dataset yielding (uint8 [S,S,3] image, float32 [14] labels)."""

    disease_names = DISEASE_NAMES

    def __init__(self, image_dir: str, label_file: str, image_size: int = 224):
        self.image_dir = image_dir
        self.image_size = image_size
        try:
            self.image_paths, self.labels = parse_label_file(label_file)
        except Exception as e:
            logger.error(f"Error reading label file: {e}")
            raise
        self.class_weights = class_weights_from_labels(self.labels)
        logger.info(f"Loaded {len(self.image_paths)} images")
        self._log_class_distribution()

    def _log_class_distribution(self):
        pos = self.labels.sum(axis=0)
        for disease, count in zip(self.disease_names, pos):
            logger.info(
                f"{disease}: {int(count)} positive samples "
                f"({count / len(self.labels) * 100:.2f}%)"
            )

    def __len__(self):
        return len(self.image_paths)

    def __getitem__(self, idx: int):
        path = os.path.join(self.image_dir, self.image_paths[idx])
        try:
            with Image.open(path) as img:
                img = img.convert("RGB")
                if img.size != (self.image_size, self.image_size):
                    img = img.resize(
                        (self.image_size, self.image_size), Image.BILINEAR
                    )
                image = np.asarray(img, np.uint8)
        except Exception as e:
            logger.error(f"Error loading image {self.image_paths[idx]}: {e}")
            raise
        return image, self.labels[idx]


class PackedChestXrayDataset:
    """Zero-decode dataset over a pre-packed memmap produced by
    ``scripts/prepare_dataset.py``.

    JPEG/PNG decode of full-resolution X-rays costs 10–20 ms/image on host
    CPUs — at ~650 img/s/chip training throughput the decode pool, not the
    TPU, becomes the bottleneck. Packing decodes+resizes ONCE into a
    contiguous uint8 memmap; training then reads batches at memcpy speed.
    Sample contract is identical to :class:`ChestXrayDataset`.
    """

    disease_names = DISEASE_NAMES
    zero_decode = True  # __getitem__ is a memcpy (see GrainLoader worker policy)

    def __init__(self, packed_dir: str):
        import json

        self.packed_dir = packed_dir
        with open(os.path.join(packed_dir, "meta.json")) as f:
            self.meta = json.load(f)
        self.image_size = int(self.meta["image_size"])
        self.images = np.load(
            os.path.join(packed_dir, "images.npy"), mmap_mode="r"
        )
        self.labels = np.load(os.path.join(packed_dir, "labels.npy"))
        self.image_paths = np.asarray(self.meta["paths"])
        self.class_weights = class_weights_from_labels(self.labels)
        logger.info(
            f"Packed dataset: {len(self)} images @ {self.image_size}px "
            f"({self.images.nbytes / 1e9:.1f} GB memmap)"
        )

    @staticmethod
    def is_packed(path: str) -> bool:
        return os.path.isdir(path) and os.path.exists(
            os.path.join(path, "images.npy")
        )

    def __getstate__(self):
        # a memmap pickles BY VALUE (the full array materialises into the
        # pickle stream) — at NIH scale that is ~16 GB shipped to every
        # loader worker process on spawn. Drop it and reopen in the worker.
        state = self.__dict__.copy()
        state["images"] = None
        return state

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, idx: int):
        if self.images is None:  # fresh worker process (see __getstate__)
            self.images = np.load(
                os.path.join(self.packed_dir, "images.npy"), mmap_mode="r"
            )
        return np.asarray(self.images[idx]), self.labels[idx]


class SyntheticChestXrayDataset:
    """Deterministic synthetic stand-in (tests, benchmarks, smoke training).

    Matches the real dataset's sample contract exactly; images/labels are a
    pure function of (seed, index).
    """

    zero_decode = True  # __getitem__ is a memcpy (see GrainLoader worker policy)

    disease_names = DISEASE_NAMES

    def __init__(self, size: int = 512, image_size: int = 224, seed: int = 0,
                 learnable: bool = False):
        """``learnable=True`` plants a bright blob in a class-specific image
        region for every positive label, making the task solvable — an
        end-to-end check that the full training stack actually learns
        (AUC → ~1), not just that it runs."""
        self.size = size
        self.image_size = image_size
        self.seed = seed
        self.learnable = learnable
        rng = np.random.default_rng(seed)
        # correlated multi-label targets with realistic (low) positive rates
        self.labels = (
            rng.random((size, NUM_CLASSES)) < rng.uniform(0.05, 0.3, NUM_CLASSES)
        ).astype(np.float32)
        # guarantee both classes appear for every disease so AUC is defined
        half = max(1, size // 2)
        for c in range(NUM_CLASSES):
            if self.labels[:, c].sum() == 0:
                self.labels[c % half, c] = 1.0
            if self.labels[:, c].sum() == size:
                self.labels[(c + 1) % half, c] = 0.0
        self.class_weights = class_weights_from_labels(self.labels)
        self.image_paths = np.asarray([f"synthetic_{i:06d}.png" for i in range(size)])
        # pre-generate a small distinct-image pool; __getitem__ is then a
        # memcpy like the packed real-data path, so synthetic throughput
        # reflects device speed rather than host image synthesis
        pool = size if learnable else min(size, 64)
        prng = np.random.default_rng((seed + 1) * 1_000_003)
        s = image_size
        base = prng.integers(0, 128, (pool, s // 8, s // 8, 3), np.uint8)
        self._images = np.repeat(np.repeat(base, 8, axis=1), 8, axis=2)
        if learnable:
            # per-class signal: a bright horizontal stripe (class c → row
            # band c of 14) drawn when label c is positive. Row bands are
            # invariant to the train pipeline's horizontal flips.
            band = max(s // NUM_CLASSES, 1)
            for i in range(pool):
                for c in np.nonzero(self.labels[i])[0]:
                    y0 = int(c) * band
                    self._images[i, y0:y0 + band] = np.minimum(
                        self._images[i, y0:y0 + band].astype(np.int32) + 127,
                        255,
                    ).astype(np.uint8)

    def __len__(self):
        return self.size

    def __getitem__(self, idx: int):
        return self._images[idx % len(self._images)], self.labels[idx]
