"""ZeRO-3-style FSDP: parameter/moment sharding over the 'data' axis.

The reference is single-device; ``mesh.fsdp: true`` is the TPU-native
scale-out of optimizer/parameter memory (SURVEY §2.6 "parallelism is a
config change"). These tests pin (a) the spec rules — largest free divisible
dim, small-leaf exemption, TP composition — and (b) the end-to-end property
that an FSDP training step reproduces the plain-DP update while actually
holding 1/data of each large leaf per device.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from gavit_tpu.config import MeshConfig, from_dict
from gavit_tpu.models.vit import build_model, init_params
from gavit_tpu.parallel.fsdp import fsdp_param_specs
from gavit_tpu.parallel.mesh import make_mesh, shard_batch


def test_fsdp_spec_rules():
    mesh = make_mesh(MeshConfig(data=8, model=1))
    params = {
        "big": jnp.zeros((32, 128)),     # largest free divisible dim → 1
        "odd": jnp.zeros((8, 129)),      # 129 % 8 != 0 → dim 0
        "prime": jnp.zeros((7, 4099)),   # nothing divisible → replicated
        "small": jnp.zeros((64,)),       # < min_size → replicated
    }
    specs = fsdp_param_specs(params, mesh, min_size=512)
    assert specs["big"] == P(None, "data")
    assert specs["odd"] == P("data", None)
    assert specs["prime"] == P()
    assert specs["small"] == P()


def test_fsdp_composes_with_tp_specs():
    from gavit_tpu.parallel.tp import model_param_specs

    mesh = make_mesh(MeshConfig(data=4, model=2))
    cfg = from_dict({"model": {
        "name": "custom", "img_size": 16, "patch_size": 8, "embed_dim": 32,
        "depth": 1, "num_heads": 2, "num_classes": 14,
    }})
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    specs = fsdp_param_specs(
        params, mesh, min_size=512, base_specs=model_param_specs(params)
    )
    # qkv [32, 96]: TP puts 'model' on the output dim, FSDP adds 'data' on
    # the remaining (input) dim
    assert specs["blocks_0"]["attn"]["qkv"]["kernel"] == P("data", "model")
    # fc2 [128, 32]: row-parallel 'model' on dim 0, 'data' on dim 1
    assert specs["blocks_0"]["mlp"]["fc2"]["kernel"] == P("model", "data")


def _make_trainer(tmp_path, mesh_cfg):
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.training import Trainer

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 2, "num_heads": 2,
                  "num_classes": 14, "drop_rate": 0.0,
                  "graph": {"enabled": True, "num_blocks": 1,
                            "adjacency": "knn", "k": 2}},
        "data": {"batch_size": 16, "image_size": 16},
        "training": {"epochs": 1, "warmup_epochs": 1, "precision": "fp32"},
        "mesh": mesh_cfg,
        "paths": {"save_dir": str(tmp_path / "ckpt"),
                  "log_dir": str(tmp_path / "logs")},
    })
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    ds = SyntheticChestXrayDataset(size=16, image_size=16, seed=0)
    loader = DataLoader(ds, 16, num_workers=0)
    return Trainer(model, params, loader, loader, cfg)


def test_fsdp_training_step_matches_dp(tmp_path):
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset

    images, labels = next(iter(DataLoader(
        SyntheticChestXrayDataset(size=16, image_size=16, seed=0), 16,
        num_workers=0,
    )))

    results = {}
    for name, mesh_cfg in [
        ("dp", {"data": 8, "model": 1}),
        ("fsdp", {"data": 8, "model": 1, "fsdp": True, "fsdp_min_size": 512}),
    ]:
        tr = _make_trainer(tmp_path / name, mesh_cfg)
        batch = shard_batch(tr.mesh, (images, labels))
        state, metrics, _ = tr._train_step(tr.state, tr.base_rng, *batch)
        results[name] = (state, float(metrics["loss"]))

    fs_state, fs_loss = results["fsdp"]
    dp_state, dp_loss = results["dp"]
    np.testing.assert_allclose(fs_loss, dp_loss, atol=1e-5)

    # large params live 'data'-sharded: each device holds 1/8 of fc1
    fc1 = fs_state.params["model"]["blocks_0"]["mlp"]["fc1"]["kernel"]
    assert "data" in str(fc1.sharding.spec)
    local = fc1.addressable_shards[0].data
    assert local.size == fc1.size // 8

    # Adam moments carry the same layout (the structural matching in
    # tp.train_state_shardings) — the ZeRO memory win covers optimizer state
    sharded_moments = [
        s for s in jax.tree.leaves(jax.tree.map(
            lambda x: x.sharding, fs_state.opt_state,
            is_leaf=lambda x: hasattr(x, "sharding"),
        )) if "data" in str(getattr(s, "spec", ""))
    ]
    assert len(sharded_moments) >= 4

    # and the update itself matches plain DP
    a = fs_state.params["model"]["blocks_0"]["mlp"]["fc1"]["kernel"]
    b = dp_state.params["model"]["blocks_0"]["mlp"]["fc1"]["kernel"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_fsdp_with_tp_and_accum_matches_dp(tmp_path):
    """Full composition: FSDP × TP × grad-accum reproduces the plain-DP
    update (the 3D-parallel 'it is just a config change' guarantee)."""
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.training import Trainer

    images, labels = next(iter(DataLoader(
        SyntheticChestXrayDataset(size=16, image_size=16, seed=0), 16,
        num_workers=0,
    )))

    def run(mesh_cfg, impl, accum):
        cfg = from_dict({
            "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                      "embed_dim": 32, "depth": 2, "num_heads": 2,
                      "num_classes": 14, "drop_rate": 0.0,
                      "graph": {"enabled": True, "num_blocks": 1,
                                "adjacency": "knn", "k": 2}},
            "data": {"batch_size": 16, "image_size": 16},
            "training": {"epochs": 1, "warmup_epochs": 1,
                         "precision": "fp32", "grad_accum_steps": accum},
            "mesh": mesh_cfg,
            "paths": {"save_dir": str(tmp_path / "c"),
                      "log_dir": str(tmp_path / "l")},
        })
        model = build_model(cfg.model, precision="fp32", **impl)
        params = init_params(model, jax.random.key(0))
        ds = SyntheticChestXrayDataset(size=16, image_size=16, seed=0)
        loader = DataLoader(ds, 16, num_workers=0)
        tr = Trainer(model, params, loader, loader, cfg)
        batch = shard_batch(tr.mesh, (images, labels))
        state, m, _ = tr._train_step(tr.state, tr.base_rng, *batch)
        return state, float(m["loss"])

    ref_state, ref_loss = run({"data": 8, "model": 1}, {}, 1)
    state, loss = run(
        {"data": 4, "model": 2, "fsdp": True, "fsdp_min_size": 512},
        {"attn_impl": "xla", "graph_impl": "xla"}, 2,
    )
    np.testing.assert_allclose(loss, ref_loss, atol=1e-5)
    qkv = state.params["model"]["blocks_0"]["attn"]["qkv"]["kernel"]
    spec = str(qkv.sharding.spec)
    assert "data" in spec and "model" in spec
    a = state.params["model"]["blocks_0"]["mlp"]["fc1"]["kernel"]
    b = ref_state.params["model"]["blocks_0"]["mlp"]["fc1"]["kernel"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
