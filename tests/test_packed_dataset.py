"""Packed memmap dataset: prepare script → PackedChestXrayDataset parity."""

import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from gavit_tpu.data import ChestXrayDataset, DataLoader, PackedChestXrayDataset

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def raw_dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("raw")
    img_dir = tmp / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i in range(6):
        name = f"im_{i}.png"
        Image.fromarray(
            rng.integers(0, 255, (48, 48), np.uint8), mode="L"
        ).save(img_dir / name)
        labels = (rng.random(14) < 0.3).astype(int)
        if labels.sum() == 0:
            labels[i % 14] = 1
        rows.append(f"{name} " + " ".join(map(str, labels)))
    label_file = tmp / "list.txt"
    label_file.write_text("\n".join(rows))
    return img_dir, label_file


@pytest.fixture(scope="module")
def packed_dir(raw_dataset, tmp_path_factory):
    img_dir, label_file = raw_dataset
    out = tmp_path_factory.mktemp("packed")
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "prepare_dataset.py"),
         "--image-dir", str(img_dir), "--labels", str(label_file),
         "--out", str(out), "--image-size", "32", "--workers", "2"],
        check=True, env={"PATH": "/usr/bin:/bin", "GAVIT_PLATFORM": "cpu",
                         "HOME": "/root"},
    )
    return out


def test_packed_matches_direct_dataset(raw_dataset, packed_dir):
    img_dir, label_file = raw_dataset
    direct = ChestXrayDataset(str(img_dir), str(label_file), image_size=32)
    packed = PackedChestXrayDataset(str(packed_dir))
    assert len(packed) == len(direct) == 6
    np.testing.assert_array_equal(packed.labels, direct.labels)
    np.testing.assert_array_equal(packed.class_weights, direct.class_weights)
    for i in range(len(direct)):
        img_d, y_d = direct[i]
        img_p, y_p = packed[i]
        np.testing.assert_array_equal(img_p, img_d)
        np.testing.assert_array_equal(y_p, y_d)


def test_packed_detection(packed_dir, tmp_path):
    assert PackedChestXrayDataset.is_packed(str(packed_dir))
    assert not PackedChestXrayDataset.is_packed(str(tmp_path))


def test_packed_through_loader(packed_dir):
    packed = PackedChestXrayDataset(str(packed_dir))
    loader = DataLoader(packed, batch_size=4, num_workers=2)
    images, labels = next(iter(loader))
    assert images.shape == (4, 32, 32, 3) and images.dtype == np.uint8
    assert labels.shape == (4, 14)
