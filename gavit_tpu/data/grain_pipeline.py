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
numpy batches), so the Trainer consumes either interchangeably.

Design (round 3): **one persistent worker pool for the whole run.** The
original per-epoch rebuild respawned the grain worker pool every epoch; a
worker spawn costs ~9 s of imports per process (measured: ``import
grain.python`` 6.8 s + interpreter startup under the TPU-plugin site 2.4 s),
which serialised into ~33 s/epoch on a small host — 300× slower than the
threaded loader. Instead the loader now builds ONE ``grain.DataLoader`` over
an *infinite* sampler (grain's ``IndexSampler(num_epochs=None)`` reshuffles
canonically per epoch — epoch = stream index // dataset length) and batches
records in the parent process, flushing at epoch boundaries. This keeps all
the epoch-exact semantics of the rebuild design:

* batches never straddle epochs (the parent batcher counts records and
  flushes/drops the tail at each boundary — grain's own ``Batch`` operation
  over a continuous stream would mix epochs);
* per-epoch reshuffle (grain's epoch-aware shuffle, seeded once);
* ``drop_last`` drops tail *records* per epoch (they are drained from the
  stream to keep it epoch-aligned);
* mid-epoch checkpointing — ``get_state`` wraps grain's iterator state with
  the stream's base epoch and in-epoch position. Grain embeds the worker
  count in that state and refuses a mismatch on restore: resume with the
  same ``num_workers`` the checkpoint was saved under.

A side benefit: batch composition is now identical for every
``num_workers`` value (the grain pool yields records in deterministic
round-robin order, i.e. sampler order, and the parent batches that single
stream; the old in-worker ``Batch`` produced per-worker-stream batches).
"""

from __future__ import annotations

import base64
import json
import logging
import sys

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


class _OffsetSampler:
    """Infinite epoch-canonical sampler starting at ``base_epoch``.

    Wraps grain's ``IndexSampler(num_epochs=None)`` — whose shuffle is
    epoch-aware (epoch = global index // records) with one fixed seed — and
    shifts the global index stream so record 0 of this sampler is record 0
    of ``base_epoch``. The returned metadata keeps the *caller's* index (the
    worker pool tracks consumed positions with it); only record_key/rng come
    from the shifted position, so permutations are canonical per global
    epoch and iterator state is portable across rebuilds with the same
    ``base_epoch`` (``GrainLoader.get_state`` persists it).
    """

    def __init__(self, num_records, shard_options, shuffle, seed, base_epoch):
        self._inner = grain.IndexSampler(
            num_records=num_records,
            shard_options=shard_options,
            shuffle=shuffle,
            num_epochs=None,
            seed=seed,
        )
        self._num_records = num_records
        self._shard_options = shard_options  # read by grain.DataLoader
        self._shuffle = shuffle
        self._seed = seed
        self._base_epoch = base_epoch
        shard_len = num_records // shard_options.shard_count
        # one epoch spans shard_len * shard_count global indices (the pool
        # walks indices ≡ shard_index mod shard_count)
        self._offset = base_epoch * shard_len * shard_options.shard_count

    def __len__(self):
        return sys.maxsize

    def __repr__(self):  # embedded in grain checkpoints — keep stable
        return (
            f"_OffsetSampler(num_records={self._num_records}, "
            f"shuffle={self._shuffle}, seed={self._seed}, "
            f"base_epoch={self._base_epoch})"
        )

    def __getitem__(self, index):
        md = self._inner[index + self._offset]
        return grain.RecordMetadata(
            index=index, record_key=md.record_key, rng=md.rng
        )


class GrainLoader:
    """Deterministic, checkpointable batching loader over a dataset.

    Epoch-exact over one persistent worker pool: grain's epoch-aware shuffle
    gives each epoch its own canonical permutation, and the parent-side
    batcher never lets a batch straddle an epoch boundary. ``set_epoch`` is
    idempotent — calling it with the current epoch keeps the live stream
    (and any restored mid-epoch position) intact; a genuine epoch jump
    (resume) tears the pool down and rebuilds it at the new base epoch.
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
        if num_workers and getattr(dataset, "zero_decode", False):
            # measured (BASELINE.md r3): for zero-decode records (packed
            # memmap / synthetic, __getitem__ ≈ memcpy) the per-record
            # worker IPC costs more than the read itself — in-process
            # streaming is strictly faster. Workers pay off only when
            # __getitem__ decodes (ChestXrayDataset).
            logger.info(
                f"grain workers {num_workers} → 0: "
                f"{type(dataset).__name__} records are zero-decode"
            )
            num_workers = 0
        self.num_workers = num_workers
        self.drop_last = drop_last
        self.seed = seed
        self.shard = shard
        self.epoch = 0
        self._source = _DatasetSource(dataset)
        self._pool = None  # the persistent grain.DataLoader
        self._stream = None  # its (checkpointable) iterator
        self._base_epoch = 0
        self._consumed = 0  # records pulled within the current epoch

    # -- pool lifecycle ---------------------------------------------------

    def _shard_options(self):
        if self.shard is not None:
            return grain.ShardOptions(
                shard_index=self.shard[0],
                shard_count=self.shard[1],
                drop_remainder=True,
            )
        return grain.ShardByJaxProcess(drop_remainder=True)

    @property
    def _shard_len(self) -> int:
        """Records per epoch on THIS process (drop_remainder sharding)."""
        if self.shard is not None:
            return len(self.dataset) // self.shard[1]
        import jax

        return len(self.dataset) // jax.process_count()

    def _build(self, base_epoch: int):
        self._teardown()
        sampler = _OffsetSampler(
            num_records=len(self._source),
            shard_options=self._shard_options(),
            shuffle=self.shuffle,
            seed=self.seed,
            base_epoch=base_epoch,
        )
        self._pool = grain.DataLoader(
            data_source=self._source,
            sampler=sampler,
            operations=[],  # records stream raw; the parent batches them
            worker_count=self.num_workers,
        )
        self._stream = iter(self._pool)
        self._base_epoch = base_epoch
        self.epoch = base_epoch
        self._consumed = 0

    def _teardown(self):
        # dropping the iterator/pool references terminates the worker pool
        self._stream = None
        self._pool = None

    def _ensure(self):
        if self._stream is None:
            self._build(self.epoch)

    def __len__(self):
        # per-PROCESS batch count: a global count would inflate the
        # Trainer's steps_per_epoch (and thus the LR schedule) by
        # process_count on multi-host runs
        n = self._shard_len
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        if epoch != self.epoch:
            self._teardown()
            self.epoch = epoch

    # -- epoch-exact batching over the continuous stream -------------------

    def _next_epoch_batch(self):
        """Next batch of the CURRENT epoch, or None at the epoch boundary
        (the underlying stream continues into the next epoch; the loader's
        ``epoch`` counter advances)."""
        self._ensure()
        remaining = self._shard_len - self._consumed
        take = min(self.batch_size, remaining)
        if take <= 0 or (self.drop_last and take < self.batch_size):
            # drain dropped tail records so the stream stays epoch-aligned
            for _ in range(max(take, 0)):
                next(self._stream)
            self._consumed = 0
            self.epoch += 1
            return None
        images, labels = [], []
        for _ in range(take):
            rec = next(self._stream)
            images.append(rec["image"])
            labels.append(rec["labels"])
        self._consumed += take
        if self._consumed == self._shard_len:
            self._consumed = 0
            self.epoch += 1
        return np.stack(images), np.stack(labels)

    class _EpochIterator:
        """Iterates the batches of one epoch; a live handle onto the
        loader's stream (fresh handles continue at the current position)."""

        def __init__(self, loader):
            self._loader = loader
            self._epoch = loader.epoch

        def __iter__(self):
            return self

        def __next__(self):
            if self._loader.epoch != self._epoch:
                raise StopIteration
            batch = self._loader._next_epoch_batch()
            if batch is None:
                raise StopIteration
            return batch

    def iterator(self):
        """Batch iterator over the current epoch (checkpointable via
        :meth:`get_state` on the loader)."""
        self._ensure()
        return self._EpochIterator(self)

    def __iter__(self):
        # yields one epoch, then leaves the loader positioned at the next
        # (matching DataLoader's per-epoch iteration contract)
        return self.iterator()

    # -- iterator checkpointing (mid-epoch resume) -----------------------

    def get_state(self) -> bytes:
        """Serialized position: grain's iterator state plus the stream's
        base epoch and in-epoch offset (restoring rebuilds the pool at the
        same base so the canonical permutations line up)."""
        self._ensure()
        return json.dumps({
            "gavit_grain": 2,
            "base_epoch": self._base_epoch,
            "epoch": self.epoch,
            "consumed": self._consumed,
            "grain": base64.b64encode(self._stream.get_state()).decode(),
        }).encode()

    def set_state(self, state: bytes):
        try:
            payload = json.loads(state)
            assert payload.get("gavit_grain") == 2
        except (ValueError, AssertionError) as e:
            raise ValueError(
                "unrecognized GrainLoader state (saved by an older build?)"
            ) from e
        if self._stream is None or payload["base_epoch"] != self._base_epoch:
            self._build(payload["base_epoch"])
        self._stream.set_state(base64.b64decode(payload["grain"]))
        self.epoch = payload["epoch"]
        self._consumed = payload["consumed"]
