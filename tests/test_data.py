"""Dataset + loader: reference label-file format, class weights, batching."""

import numpy as np
import pytest

from gavit_tpu.data.dataset import (
    ChestXrayDataset,
    DISEASE_NAMES,
    SyntheticChestXrayDataset,
    class_weights_from_labels,
    parse_label_file,
)
from gavit_tpu.data.loader import DataLoader


def _write_label_file(tmp_path, rows):
    path = tmp_path / "train_list.txt"
    lines = [f"{name} " + " ".join(str(v) for v in labels)
             for name, labels in rows]
    path.write_text("\n".join(lines))
    return str(path)


def test_parse_label_file(tmp_path):
    rows = [
        ("img_a.png", [1] + [0] * 13),
        ("img_b.png", [0] * 7 + [1] * 7),
    ]
    path = _write_label_file(tmp_path, rows)
    paths, labels = parse_label_file(path)
    assert list(paths) == ["img_a.png", "img_b.png"]
    assert labels.shape == (2, 14)
    assert labels.dtype == np.float32
    assert labels[0, 0] == 1.0 and labels[1, 7] == 1.0


def test_parse_rejects_wrong_column_count(tmp_path):
    path = tmp_path / "bad.txt"
    path.write_text("img.png 1 0 1\n")
    with pytest.raises(ValueError, match="expected 14"):
        parse_label_file(str(path))


def test_class_weights_neg_over_pos():
    """pos_weight = neg/pos per class (reference ``dataset.py:59-64``)."""
    labels = np.zeros((10, 14), np.float32)
    labels[:2, 0] = 1.0  # 2 pos, 8 neg → weight 4
    labels[:5, 1] = 1.0  # 5/5 → weight 1
    w = class_weights_from_labels(labels)
    assert w[0] == 4.0 and w[1] == 1.0


def test_class_weights_zero_positive_class_is_finite():
    """A split where a rare disease has NO positives must not produce an
    inf pos_weight (the reference's neg/pos would; an inf pos_weight turns
    the first val positive into inf WBCE → NaN epoch metrics)."""
    labels = np.zeros((10, 14), np.float32)
    labels[:2, 0] = 1.0
    w = class_weights_from_labels(labels)  # classes 1..13 have zero positives
    assert np.isfinite(w).all()
    assert w[0] == 4.0
    assert (w[1:] == 1.0).all()


def test_train_step_finite_with_all_negative_disease():
    """One real training step on a split whose last disease (think Hernia)
    is all-negative: loss and gradients stay finite end-to-end."""
    import jax

    from gavit_tpu.config import from_dict
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.training import Trainer

    ds = SyntheticChestXrayDataset(size=16, image_size=8, seed=0)
    ds.labels[:, -1] = 0.0  # degenerate: zero positives for one class
    ds.class_weights = class_weights_from_labels(ds.labels)
    assert np.isfinite(ds.class_weights).all()

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 8, "patch_size": 4,
                  "embed_dim": 16, "depth": 1, "num_heads": 2,
                  "num_classes": 14},
        "data": {"batch_size": 8, "image_size": 8},
        "training": {"epochs": 1, "warmup_epochs": 1, "precision": "fp32",
                     "log_every": 1000},
        "paths": {"save_dir": "/tmp/degen_ck", "log_dir": "/tmp/degen_lg"},
    })
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    tl = DataLoader(ds, 8, shuffle=False, num_workers=1, drop_last=True)
    vl = DataLoader(ds, 8, shuffle=False, num_workers=1)
    trainer = Trainer(model, params, tl, vl, cfg)
    metrics = trainer.train_epoch()
    assert np.isfinite(metrics["loss"]), metrics
    val = trainer.validate()
    assert np.isfinite(val["loss"]), val
    # the trained params themselves stayed finite
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(jax.device_get(trainer.state.params)))


def test_dataset_loads_images(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for name in ("a.png", "b.png"):
        Image.fromarray(
            rng.integers(0, 255, (64, 64), np.uint8), mode="L"
        ).save(img_dir / name)
    labels = [("a.png", [1] + [0] * 13), ("b.png", [0] * 13 + [1])]
    ds = ChestXrayDataset(
        str(img_dir), _write_label_file(tmp_path, labels), image_size=32
    )
    assert len(ds) == 2
    assert ds.disease_names == DISEASE_NAMES
    image, y = ds[0]
    assert image.shape == (32, 32, 3) and image.dtype == np.uint8
    assert y.shape == (14,)


def test_loader_shapes_and_determinism():
    ds = SyntheticChestXrayDataset(size=50, image_size=16, seed=0)
    loader = DataLoader(ds, batch_size=16, shuffle=True, num_workers=2, seed=7)
    batches = list(loader)
    assert len(batches) == 4  # ceil(50/16), drop_last=False
    assert batches[0][0].shape == (16, 16, 16, 3)
    assert batches[-1][0].shape == (2, 16, 16, 3)
    # same epoch index → same order
    loader2 = DataLoader(ds, batch_size=16, shuffle=True, num_workers=2, seed=7)
    np.testing.assert_array_equal(batches[0][1], next(iter(loader2))[1])
    # another epoch index reshuffles
    loader2.set_epoch(1)
    second_epoch = next(iter(loader2))
    assert not np.array_equal(batches[0][1], second_epoch[1])


def test_loader_drop_last():
    ds = SyntheticChestXrayDataset(size=50, image_size=8)
    loader = DataLoader(ds, batch_size=16, drop_last=True, num_workers=1)
    batches = list(loader)
    assert len(batches) == 3
    assert all(b[0].shape[0] == 16 for b in batches)


def test_synthetic_every_class_has_both_labels():
    ds = SyntheticChestXrayDataset(size=64, image_size=8)
    pos = ds.labels.sum(0)
    assert (pos > 0).all() and (pos < len(ds)).all()
    assert np.isfinite(ds.class_weights).all()
