"""GrainLoader: determinism, batching, mid-epoch checkpoint/restore."""

import numpy as np
import pytest

grain = pytest.importorskip("grain")

from gavit_tpu.data import SyntheticChestXrayDataset
from gavit_tpu.data.grain_pipeline import GrainLoader


def _ds(size=40):
    return SyntheticChestXrayDataset(size=size, image_size=8, seed=0)


def test_batch_shapes():
    loader = GrainLoader(_ds(), batch_size=16, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    images, labels = batches[0]
    assert images.shape == (16, 8, 8, 3)
    assert labels.shape == (16, 14)


def test_shuffle_determinism():
    a = list(GrainLoader(_ds(), 8, shuffle=True, seed=3))
    b = list(GrainLoader(_ds(), 8, shuffle=True, seed=3))
    np.testing.assert_array_equal(a[0][1], b[0][1])
    c = list(GrainLoader(_ds(), 8, shuffle=True, seed=4))
    assert not np.array_equal(a[0][1], c[0][1])


def test_epochs_differ_when_shuffled():
    loader = GrainLoader(_ds(), 8, shuffle=True, seed=3)
    epoch1 = list(loader)  # auto-advances to the next epoch, like DataLoader
    epoch2 = list(loader)
    assert len(epoch1) == len(epoch2) == 5
    assert not np.array_equal(epoch1[0][1], epoch2[0][1])


def test_batches_never_straddle_epochs():
    """drop_last=False + non-divisible size: each epoch yields its own tail
    batch and the next epoch restarts cleanly (ADVICE r1: the old persistent
    multi-epoch sampler let grain.Batch mix samples across the boundary)."""
    ds = _ds(size=20)  # 20 = 2x8 + 4
    loader = GrainLoader(ds, 8, shuffle=True, seed=3)
    epoch1 = list(loader)
    epoch2 = list(loader)
    assert [b[0].shape[0] for b in epoch1] == [8, 8, 4]
    assert [b[0].shape[0] for b in epoch2] == [8, 8, 4]
    # every sample appears exactly once per epoch
    ids1 = np.concatenate([b[1] for b in epoch1])
    assert ids1.shape[0] == 20


def test_mid_epoch_checkpoint_restore():
    """The production feature: save iterator state after N batches; a fresh
    loader restored from it continues with batch N+1 exactly."""
    loader = GrainLoader(_ds(), 8, shuffle=True, seed=7)
    it = loader.iterator()
    _ = next(it)
    _ = next(it)
    state = loader.get_state()
    expected = next(it)

    loader2 = GrainLoader(_ds(), 8, shuffle=True, seed=7)
    loader2.set_state(state)
    got = next(loader2.iterator())
    np.testing.assert_array_equal(got[0], expected[0])
    np.testing.assert_array_equal(got[1], expected[1])


def test_persistent_pool_across_epochs():
    """r3 perf fix: sequential epochs stream one grain DataLoader (worker
    pool) instead of rebuilding per epoch (measured 33 s/epoch spawn cost);
    an epoch JUMP (resume) rebuilds at the new base."""
    loader = GrainLoader(_ds(), 8, shuffle=True, seed=3)
    list(loader)
    pool = loader._pool
    assert pool is not None
    list(loader)  # second epoch: same pool
    assert loader._pool is pool
    assert loader.epoch == 2
    loader.set_epoch(7)  # genuine jump: lazily rebuilt
    assert loader._pool is None
    first = next(iter(loader))
    assert loader._pool is not pool and first[0].shape[0] == 8


def test_zero_decode_datasets_skip_worker_pool():
    """Packed/synthetic records are memcpys; per-record worker IPC measured
    19x slower than in-process streaming (BASELINE.md r3) — the loader
    drops to workers=0 for datasets marked zero_decode."""
    loader = GrainLoader(_ds(), 8, num_workers=4)
    assert loader.num_workers == 0


def test_worker_pool_batches_match_in_process_stream():
    """Parent-side batching re-merges the worker streams in sampler order
    (grain's deterministic round-robin), so batch composition is identical
    for every worker count — a property the old in-worker grain.Batch did
    not have. Also covers worker spawn + shared-memory record passing, and
    a mid-epoch pooled-loader state save/restore."""
    ds = _ds(size=24)

    class _Decode:  # defeat the zero_decode auto-policy: force real workers
        zero_decode = False

        def __len__(self):
            return len(ds)

        def __getitem__(self, idx):
            return ds[idx]

    ref = list(GrainLoader(ds, 8, shuffle=True, seed=5))
    pooled = GrainLoader(_Decode(), 8, shuffle=True, num_workers=2, seed=5)
    assert pooled.num_workers == 2
    it = iter(pooled)
    got = [next(it)]
    state = pooled.get_state()  # mid-epoch, from the POOLED stream
    got += list(it)
    assert len(got) == len(ref) == 3
    for (gi, gl), (ri, rl) in zip(got, ref):
        np.testing.assert_array_equal(gi, ri)
        np.testing.assert_array_equal(gl, rl)
    # mid-epoch state restores into a fresh loader with the SAME worker
    # count (grain embeds the count in its state and refuses a mismatch —
    # resume with the num_workers the checkpoint was saved under)
    resumed = GrainLoader(_Decode(), 8, shuffle=True, num_workers=2, seed=5)
    resumed.set_state(state)
    np.testing.assert_array_equal(next(resumed.iterator())[0], ref[1][0])


def test_packed_dataset_pickles_without_materializing_memmap(tmp_path):
    """np.memmap pickles BY VALUE (~16 GB at NIH scale shipped to every
    worker on spawn); __getstate__ drops it and the worker reopens lazily."""
    import pickle

    from gavit_tpu.data.dataset import PackedChestXrayDataset

    ds = _ds(size=6)
    np.save(tmp_path / "images.npy",
            np.stack([ds[i][0] for i in range(6)]))
    np.save(tmp_path / "labels.npy", ds.labels)
    (tmp_path / "meta.json").write_text(
        '{"image_size": 8, "paths": ["a","b","c","d","e","f"]}')
    packed = PackedChestXrayDataset(str(tmp_path))
    blob = pickle.dumps(packed)
    assert len(blob) < packed.images.nbytes  # image payload not embedded
    clone = pickle.loads(blob)
    assert clone.images is None  # lazy until first read
    np.testing.assert_array_equal(clone[3][0], packed[3][0])


class _PreemptAfterSteps:
    """Stub preemption handler: fires after n checks (≈ n train steps)."""

    def __init__(self, n):
        self.n = n
        self.count = 0

    @property
    def preempted(self):
        self.count += 1
        return self.count > self.n

    def install(self):
        return self

    def uninstall(self):
        pass


def _grain_trainer(tmp_path, ds, epochs=1):
    import jax

    from gavit_tpu.config import from_dict
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.training import Trainer

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 8, "patch_size": 4,
                  "embed_dim": 16, "depth": 1, "num_heads": 2,
                  "num_classes": 14},
        "data": {"batch_size": 8, "image_size": 8},
        "training": {"epochs": epochs, "warmup_epochs": 1,
                     "precision": "fp32", "log_every": 1000},
        "paths": {"save_dir": str(tmp_path / "ckpt"),
                  "log_dir": str(tmp_path / "logs")},
    })
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    tl = GrainLoader(ds, 8, shuffle=True, num_workers=0, drop_last=True,
                     seed=11)
    vl = GrainLoader(ds, 8, shuffle=False, num_workers=0)
    return cfg, Trainer(model, params, tl, vl, cfg)


def test_kill_mid_epoch_resume_consumes_exactly_unseen_samples(tmp_path):
    """The flagship checkpointable-iteration feature, end-to-end through the
    Trainer: preempt mid-epoch, resume from the saved checkpoint, and the
    union of batches trained before + after is EXACTLY one epoch's samples,
    with no overlap — despite the device_iterator's prefetch lookahead."""
    from gavit_tpu.utils import checkpoint as ckpt_lib

    ds = _ds(size=64)
    # sample identity: each synthetic image is deterministic per index
    id_of = {ds[i][0].tobytes(): i for i in range(len(ds))}

    cfg, trainer = _grain_trainer(tmp_path, ds)
    seen_a = []
    orig_step = trainer._train_step

    def recording_step(state, rng, images, labels):
        for row in np.asarray(images):
            seen_a.append(id_of[row.tobytes()])
        return orig_step(state, rng, images, labels)

    trainer._train_step = recording_step
    trainer._preemption = _PreemptAfterSteps(3)
    trainer.train()  # preempts after a few steps, saves mid-epoch checkpoint
    steps_a = len(seen_a) // 8
    assert 0 < steps_a < 8 and len(seen_a) == steps_a * 8

    latest = ckpt_lib.latest_checkpoint(cfg.paths.save_dir)
    cfg2, trainer2 = _grain_trainer(tmp_path, ds)
    trainer2.restore_checkpoint(latest)
    assert trainer2.current_epoch == 0  # epoch 0 was in progress

    seen_b = []
    orig_step2 = trainer2._train_step

    def recording_step2(state, rng, images, labels):
        for row in np.asarray(images):
            seen_b.append(id_of[row.tobytes()])
        return orig_step2(state, rng, images, labels)

    trainer2._train_step = recording_step2
    trainer2.train()
    # exactly the remaining batches of epoch 0
    assert len(seen_b) == (8 - steps_a) * 8
    assert set(seen_a).isdisjoint(seen_b)
    assert sorted(seen_a + seen_b) == list(range(64))
