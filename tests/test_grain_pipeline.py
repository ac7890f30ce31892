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
    loader = GrainLoader(_ds(), 8, shuffle=True, seed=3, num_epochs=2)
    epoch1 = [next(loader.iterator()) for _ in range(5)]
    epoch2 = [next(loader.iterator()) for _ in range(5)]
    assert not np.array_equal(epoch1[0][1], epoch2[0][1])


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
