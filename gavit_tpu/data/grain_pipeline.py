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
    """Deterministic, checkpointable batching loader over a dataset.

    Epoch-exact: each epoch is its own single-pass sampler seeded with
    ``seed + epoch`` (matching the threaded ``DataLoader``'s per-epoch
    shuffles), so batches never straddle epoch boundaries and per-epoch
    sample accounting is exact regardless of ``drop_last``. ``set_epoch``
    is idempotent — calling it with the current epoch keeps the live
    iterator (and any restored mid-epoch position) intact.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 0,
        drop_last: bool = False,
        seed: int = 42,
        shard: tuple[int, int] | None = None,
    ):
        """``shard=(index, count)`` overrides the default ShardByJaxProcess
        stream assignment — required when the mesh's ``model`` axis crosses
        process boundaries and several processes must feed the same stream
        (:func:`gavit_tpu.parallel.mesh.data_feed_spec`)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self.shard = shard
        self.epoch = 0
        self._source = _DatasetSource(dataset)
        self._loader = None
        self._iterator = None

    def _build(self):
        shard_options = (
            grain.ShardOptions(shard_index=self.shard[0],
                               shard_count=self.shard[1],
                               drop_remainder=True)
            if self.shard is not None
            else grain.ShardByJaxProcess(drop_remainder=True)
        )
        sampler = grain.IndexSampler(
            num_records=len(self._source),
            shard_options=shard_options,
            shuffle=self.shuffle,
            num_epochs=1,
            seed=self.seed + self.epoch,
        )
        operations = [
            grain.Batch(batch_size=self.batch_size,
                        drop_remainder=self.drop_last),
            _ToBatchArrays(),
        ]
        self._loader = grain.DataLoader(
            data_source=self._source,
            sampler=sampler,
            operations=operations,
            worker_count=self.num_workers,
        )
        self._iterator = None

    def __len__(self):
        # per-PROCESS batch count: the sampler shards records with
        # ShardByJaxProcess(drop_remainder=True), so each host yields its
        # shard's batches — a global count would inflate the Trainer's
        # steps_per_epoch (and thus the LR schedule) by process_count on
        # multi-host runs (the threaded DataLoader's _num_local analogue)
        if self.shard is not None:
            n = len(self.dataset) // self.shard[1]
        else:
            import jax

            n = len(self.dataset) // jax.process_count()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        if self._loader is None or epoch != self.epoch:
            self.epoch = epoch
            self._build()

    def iterator(self) -> grain.PyGrainDatasetIterator:
        """The persistent (checkpointable) iterator of the current epoch."""
        if self._loader is None:
            self._build()
        if self._iterator is None:
            self._iterator = iter(self._loader)
        return self._iterator

    def __iter__(self):
        it = self.iterator()
        while True:
            try:
                yield next(it)
            except StopIteration:
                break
        self.set_epoch(self.epoch + 1)

    # -- iterator checkpointing (mid-epoch resume) -----------------------

    def get_state(self) -> bytes:
        """Serialized position within the CURRENT epoch; pair it with the
        epoch number (``Trainer.save_checkpoint`` persists both)."""
        return self.iterator().get_state()

    def set_state(self, state: bytes):
        self.iterator().set_state(state)
