"""Host-side batching loader with threaded decode and device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader`` (multiprocess
workers, ``scripts/train.py:76-90``). PIL decode/resize releases the GIL in
C, so a thread pool gives worker-process parallelism without pickling/fork
overhead, and batches are assembled as contiguous uint8 arrays.

``device_iterator`` overlaps H2D transfer with compute: it keeps ``prefetch``
batches in flight (already placed on the mesh with the batch sharding) ahead
of the training step that consumes them, which is what sustains step-time
overlap on TPU (the input pipeline is the usual throughput killer —
SURVEY.md §7 stage 8).
"""

from __future__ import annotations

import collections
from concurrent.futures import ThreadPoolExecutor

import numpy as np


class DataLoader:
    """Batching iterator over a map-style dataset.

    Matches reference semantics: shuffle train only, drop_last=False
    (``scripts/train.py:76-90``). Per-epoch shuffles are seeded and
    reproducible.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 4,
        drop_last: bool = False,
        seed: int = 42,
        shard_by_process: bool = False,
        shard: tuple[int, int] | None = None,
    ):
        """``shard_by_process=True`` makes each JAX process iterate only its
        1/process_count slice of the (seed+epoch-shuffled) global index
        stream — the threaded-loader counterpart of grain's
        ``ShardByJaxProcess``. ``batch_size`` is then the PER-PROCESS batch;
        :func:`gavit_tpu.parallel.mesh.shard_batch` assembles the global
        array from the per-process shards.

        ``shard=(index, count)`` overrides the process-based sharding with an
        explicit stream assignment — required when the mesh's ``model`` axis
        crosses process boundaries, where several processes form one feeding
        group and must iterate the SAME stream
        (:func:`gavit_tpu.parallel.mesh.data_feed_spec` computes the tuple).
        """
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.shard = shard
        self.shard_by_process = shard_by_process or shard is not None
        self.epoch = 0
        # separate pools: batch-assembly lookahead tasks must never compete
        # with (and starve) the per-item decode tasks they fan out to
        self._item_pool = ThreadPoolExecutor(max_workers=self.num_workers)
        self._batch_pool = ThreadPoolExecutor(max_workers=2)

    def _shard_spec(self):
        if self.shard is not None:
            return self.shard
        import jax

        return jax.process_index(), jax.process_count()

    def _num_local(self):
        n = len(self.dataset)
        if self.shard_by_process:
            # equal shards across streams (trailing remainder dropped so
            # every host dispatches the same number of steps)
            return n // self._shard_spec()[1]
        return n

    def __len__(self):
        n = self._num_local()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            indices = rng.permutation(n)
        else:
            indices = np.arange(n)
        if self.shard_by_process:
            index, count = self._shard_spec()
            per = n // count
            start = index * per
            indices = indices[start : start + per]
        return indices

    def _load_batch(self, idx_batch):
        items = list(self._item_pool.map(self.dataset.__getitem__, idx_batch))
        images = np.stack([it[0] for it in items])
        labels = np.stack([it[1] for it in items])
        return images, labels

    def __iter__(self):
        indices = self._indices()
        n_batches = len(self)
        # one-batch lookahead: decode batch i+1 while batch i is consumed
        pending = collections.deque()
        submit = self._batch_pool.submit

        def batch_slice(i):
            return indices[i * self.batch_size : (i + 1) * self.batch_size]

        if n_batches > 0:
            pending.append(submit(self._load_batch, batch_slice(0)))
        for i in range(n_batches):
            if i + 1 < n_batches:
                pending.append(submit(self._load_batch, batch_slice(i + 1)))
            yield pending.popleft().result()
        self.epoch += 1


def device_iterator(loader, mesh=None, prefetch: int = 2, state_fn=None):
    """Wrap a host loader: place batches on the mesh ahead of consumption.

    Yields ``(images, labels, valid, state)``. Ragged tail batches
    (drop_last=False loaders on a multi-device mesh) are wrap-padded up to
    the data-axis size; ``valid`` is shard_batch_padded's host-side
    genuine-row mask (None when every row is genuine, as on the mesh-less
    path) — consumers mask model outputs with it before accumulating
    metrics.

    ``state_fn`` (e.g. ``GrainLoader.get_state``) is sampled immediately
    after each batch is pulled from the host iterator — BEFORE lookahead
    pulls the next one — so ``state`` is the exact resume point "everything
    up to and including this batch was consumed", immune to prefetch skew.
    """
    from gavit_tpu.parallel.mesh import shard_batch_padded

    import jax

    def place(batch):
        # runs immediately after the item's next() and before the lookahead
        # pulls another, so state_fn still snapshots the exact "everything
        # up to and including this batch" position
        state = state_fn() if state_fn is not None else None
        if mesh is not None:
            placed, valid = shard_batch_padded(mesh, batch)
            return (*placed, valid, state)
        return (*jax.device_put(batch), None, state)

    yield from prefetched_iter(iter(loader), place, prefetch)


def prefetched_iter(it, place, prefetch: int):
    """Keep ``prefetch`` placed items in flight ahead of consumption: the
    device transfers issued by ``place`` overlap the consumer's dispatch.
    Shared by :func:`device_iterator` and the trainer's stacked-batch path.
    """
    queue = collections.deque()
    try:
        for _ in range(max(1, prefetch)):
            queue.append(place(next(it)))
    except StopIteration:
        pass
    while queue:
        try:
            queue.append(place(next(it)))
        except StopIteration:
            pass
        yield queue.popleft()
