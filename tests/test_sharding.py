"""Data-parallel training over the 8-device virtual mesh (SURVEY §2.6):
batch sharded on 'data', params replicated, grads psum'd by the partitioner."""

import jax
import jax.numpy as jnp
import numpy as np

from gavit_tpu.config import MeshConfig, from_dict
from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
from gavit_tpu.models.vit import build_model, init_params
from gavit_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from gavit_tpu.training import Trainer


def _tiny_cfg(n_dev):
    return from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 1, "num_heads": 2,
                  "num_classes": 14, "drop_rate": 0.1,
                  "graph": {"enabled": True, "num_blocks": 1,
                            "adjacency": "knn", "k": 2}},
        "data": {"batch_size": 2 * n_dev, "image_size": 16},
        "training": {"epochs": 1, "warmup_epochs": 1, "precision": "fp32"},
        "mesh": {"data": n_dev, "model": 1},
    })


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=8, model=1))
    assert mesh.devices.shape == (8, 1)
    assert mesh.axis_names == ("data", "model")
    mesh_auto = make_mesh(MeshConfig(data=-1, model=1))
    assert mesh_auto.devices.shape == (8, 1)


def test_batch_sharded_across_devices():
    mesh = make_mesh(MeshConfig(data=8))
    x = np.zeros((16, 4), np.float32)
    placed = shard_batch(mesh, x)
    assert placed.sharding == batch_sharding(mesh)
    # each device holds 2 rows
    assert placed.addressable_shards[0].data.shape == (2, 4)


def test_train_step_on_8_device_mesh():
    n_dev = 8
    cfg = _tiny_cfg(n_dev)
    mesh = make_mesh(cfg.mesh)
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    ds = SyntheticChestXrayDataset(size=cfg.data.batch_size, image_size=16)
    loader = DataLoader(ds, cfg.data.batch_size, num_workers=1)
    trainer = Trainer(model, params, loader, loader, cfg, mesh=mesh)

    images, labels = next(iter(loader))
    batch = shard_batch(mesh, (images, labels))
    state, metrics, preds = trainer._train_step(
        trainer.state, trainer.base_rng, *batch
    )
    jax.block_until_ready(preds)
    assert preds.shape == (cfg.data.batch_size, 14)
    assert np.isfinite(float(metrics["loss"]))
    # updated params stay replicated
    w = state.params["model"]["head"]["kernel"]
    assert w.sharding.is_fully_replicated


def test_sharded_matches_single_device():
    """The global computation must be independent of the mesh layout."""
    cfg8 = _tiny_cfg(8)
    cfg1 = _tiny_cfg(8)  # same global batch size
    model = build_model(cfg8.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    ds = SyntheticChestXrayDataset(size=cfg8.data.batch_size, image_size=16)
    loader = DataLoader(ds, cfg8.data.batch_size, num_workers=1)
    images, labels = next(iter(loader))

    mesh8 = make_mesh(MeshConfig(data=8))
    mesh1 = make_mesh(MeshConfig(data=1), devices=jax.devices()[:1])
    t8 = Trainer(model, params, loader, loader, cfg8, mesh=mesh8)
    t1 = Trainer(model, params, loader, loader, cfg1, mesh=mesh1)

    s8, m8, p8 = t8._train_step(t8.state, t8.base_rng,
                                *shard_batch(mesh8, (images, labels)))
    s1, m1, p1 = t1._train_step(t1.state, t1.base_rng,
                                *shard_batch(mesh1, (images, labels)))
    assert abs(float(m8["loss"]) - float(m1["loss"])) < 1e-5
    np.testing.assert_allclose(
        np.asarray(s8.params["model"]["head"]["kernel"]),
        np.asarray(s1.params["model"]["head"]["kernel"]),
        atol=1e-6,
    )


def test_dryrun_multichip_entrypoint():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_pad_batch_wraps_rows():
    from gavit_tpu.parallel.mesh import pad_batch, shard_batch_padded

    x = np.arange(5 * 3, dtype=np.float32).reshape(5, 3)
    y = np.arange(5, dtype=np.int32)
    (px, py), n = pad_batch((x, y), 8)
    assert n == 5 and px.shape == (8, 3) and py.shape == (8,)
    np.testing.assert_array_equal(px[5:], x[:3])  # wrap: rows 0..2 repeated
    np.testing.assert_array_equal(py[5:], y[:3])
    # already divisible: untouched
    (qx, _), n2 = pad_batch((x[:4], y[:4]), 2)
    assert n2 == 4 and qx.shape == (4, 3)

    mesh = make_mesh(MeshConfig(data=8))
    (sx, sy), valid = shard_batch_padded(mesh, (x, y))
    assert valid.sum() == 5 and sx.shape == (8, 3)
    np.testing.assert_array_equal(valid, [True] * 5 + [False] * 3)
    np.testing.assert_array_equal(np.asarray(sx)[valid], x)


def test_take_valid_handles_interleaved_pads():
    """With >1 process the pad rows interleave with real rows in the global
    batch — _take_valid must gather exactly the genuine ones (a prefix slice
    would keep p0's duplicates and drop p1's real tail)."""
    import jax.numpy as jnp

    from gavit_tpu.training.trainer import _n_valid, _take_valid

    # simulate the 2-process layout: [p0 r0 r1 r2 pad, p1 r3 r4 r5 pad]
    preds = jnp.arange(8.0).reshape(8, 1)
    valid = np.array([1, 1, 1, 0, 1, 1, 1, 0], bool)
    kept = np.asarray(_take_valid(preds, valid)).ravel()
    np.testing.assert_array_equal(kept, [0, 1, 2, 4, 5, 6])
    assert _n_valid(preds, valid) == 6
    assert _take_valid(preds, None) is preds
    assert _n_valid(preds, None) == 8


def test_ragged_tail_validation_on_mesh(tmp_path):
    """drop_last=False val loaders with a tail batch not divisible by the
    data-axis size must not crash validate() (ADVICE r1, medium) and must
    average loss over genuine rows only."""
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.training import Trainer

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 1, "num_heads": 2,
                  "num_classes": 14},
        "data": {"batch_size": 16, "image_size": 16},
        "training": {"epochs": 1, "warmup_epochs": 1, "precision": "fp32"},
        "paths": {"save_dir": str(tmp_path / "c"),
                  "log_dir": str(tmp_path / "l")},
    })
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    tr_ds = SyntheticChestXrayDataset(size=16, image_size=16, seed=0)
    va_ds = SyntheticChestXrayDataset(size=21, image_size=16, seed=1)  # 16+5
    tl = DataLoader(tr_ds, 16, num_workers=1)
    vl = DataLoader(va_ds, 16, num_workers=1)
    mesh = make_mesh(MeshConfig(data=8))
    t = Trainer(model, params, tl, vl, cfg, mesh=mesh)
    m = t.validate()
    assert np.isfinite(m["loss"]) and np.isfinite(m["mean_auc"])

    # cross-check the masked loss against a single-device exact computation
    mesh1 = make_mesh(MeshConfig(data=1), devices=jax.devices()[:1])
    t1 = Trainer(model, params, tl, vl, cfg, mesh=mesh1)
    m1 = t1.validate()
    assert abs(m["loss"] - m1["loss"]) < 1e-5


def test_ragged_tail_train_epoch_on_mesh(tmp_path):
    """A ragged final train batch (drop_last=False) wrap-pads instead of
    crashing; the step counter still advances once per host batch."""
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.training import Trainer

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 1, "num_heads": 2,
                  "num_classes": 14},
        "data": {"batch_size": 16, "image_size": 16},
        "training": {"epochs": 1, "warmup_epochs": 1, "precision": "fp32",
                     "log_every": 100},
        "paths": {"save_dir": str(tmp_path / "c"),
                  "log_dir": str(tmp_path / "l")},
    })
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    ds = SyntheticChestXrayDataset(size=21, image_size=16, seed=0)
    loader = DataLoader(ds, 16, num_workers=1)
    mesh = make_mesh(MeshConfig(data=8))
    t = Trainer(model, params, loader, loader, cfg, mesh=mesh)
    metrics = t.train_epoch()
    assert int(t.state.step) == 2  # batches of 16 and 5(padded to 8)
    assert np.isfinite(metrics["loss"])


def test_data_feed_spec_axis_order_independent(monkeypatch):
    """data_feed_spec must group by the 'data' AXIS, not mesh dimension 0 —
    Trainer/evaluate accept caller-supplied meshes of any axis order."""
    import types

    import numpy as np

    from gavit_tpu.parallel import mesh as mesh_lib

    class _Dev:
        def __init__(self, pid):
            self.process_index = pid

    # 4 processes, mesh ('model'=2, 'data'=2): process p owns the devices
    # of data-coordinate p % 2 and model-coordinate p // 2 → two feeding
    # groups {0,2} (data 0) and {1,3} (data 1). Grouping by dim 0 would
    # instead split on the MODEL coordinate.
    devs = np.array([[_Dev(0), _Dev(1)], [_Dev(2), _Dev(3)]], dtype=object)
    fake_mesh = types.SimpleNamespace(
        devices=devs, axis_names=("model", "data")
    )
    monkeypatch.setattr(mesh_lib.jax, "process_count", lambda: 4)
    for pid, expect in [(0, 0), (1, 1), (2, 0), (3, 1)]:
        monkeypatch.setattr(mesh_lib.jax, "process_index", lambda p=pid: p)
        shard_index, num_shards, k = mesh_lib.data_feed_spec(fake_mesh)
        assert (shard_index, num_shards, k) == (expect, 2, 1), (
            pid, shard_index, num_shards, k)
