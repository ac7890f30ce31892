"""Grain-backed input pipeline: the production loader.

Adds what the threaded loader (``gavit_tpu/data/loader.py``) and the
reference's torch DataLoader (``scripts/train.py:76-90``) cannot provide:

* **checkpointable iteration** — the iterator's exact position serialises
  with the model checkpoint, so preemption-resume continues mid-epoch on the
  next sample, not at an epoch boundary;
* **multi-process workers** with deterministic per-record seeding;
* **per-host sharding** (``ShardByJaxProcess``) for multi-host slices — each
  host reads only its slice of the global batch.

The iteration interface matches ``DataLoader`` (yields ``(images, labels)``
numpy batches; ``set_epoch`` is a no-op because grain's sampler is
epoch-aware internally), so the Trainer consumes either interchangeably.
"""

from __future__ import annotations

import logging

import numpy as np

import grain.python as grain

logger = logging.getLogger(__name__)


class _DatasetSource(grain.RandomAccessDataSource):
    """Adapts a map-style dataset (ChestXrayDataset / synthetic) to grain."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self):
        return len(self._dataset)

    def __getitem__(self, idx):
        image, labels = self._dataset[idx]
        return {"image": image, "labels": labels}

    def __repr__(self):
        # grain embeds this in iterator checkpoints and validates it on
        # restore — must be stable across processes (no object addresses)
        return (
            f"_DatasetSource({type(self._dataset).__name__}, "
            f"len={len(self._dataset)})"
        )


class _ToBatchArrays(grain.MapTransform):
    def map(self, batch):
        return batch["image"], batch["labels"]


class GrainLoader:
    """Deterministic, checkpointable batching loader over a dataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 0,
        drop_last: bool = False,
        seed: int = 42,
        num_epochs: int | None = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        source = _DatasetSource(dataset)
        sampler = grain.IndexSampler(
            num_records=len(source),
            shard_options=grain.ShardByJaxProcess(drop_remainder=True),
            shuffle=shuffle,
            num_epochs=num_epochs,
            seed=seed,
        )
        operations = [
            grain.Batch(batch_size=batch_size, drop_remainder=drop_last),
            _ToBatchArrays(),
        ]
        self._loader = grain.DataLoader(
            data_source=source,
            sampler=sampler,
            operations=operations,
            worker_count=num_workers,
        )
        self._iterator = None

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        # grain's sampler tracks epochs internally via the record index
        pass

    def iterator(self) -> grain.PyGrainDatasetIterator:
        """The persistent (checkpointable) iterator over all epochs."""
        if self._iterator is None:
            self._iterator = iter(self._loader)
        return self._iterator

    def __iter__(self):
        # fresh single-epoch view for epoch-style training loops
        count = 0
        n = len(self)
        it = self.iterator()
        while count < n:
            try:
                yield next(it)
            except StopIteration:
                return
            count += 1

    # -- iterator checkpointing (mid-epoch resume) -----------------------

    def get_state(self) -> bytes:
        return self.iterator().get_state()

    def set_state(self, state: bytes):
        self.iterator().set_state(state)
