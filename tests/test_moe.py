"""Mixture-of-Experts blocks (models/moe.py) + expert parallelism.

Pins: the router's static-capacity dispatch invariants, exact equivalence to
the dense MLP in the degenerate E=1/k=1 case, auxiliary-loss plumbing
through the Trainer objective (including under remat + grad-accum), and the
EP contract — expert banks 'model'-sharded with sharded == single-device
math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gavit_tpu.config import MeshConfig, MoEConfig, from_dict
from gavit_tpu.models.moe import (
    MoEMlp,
    expert_capacity,
    moe_aux_loss,
    router_dispatch,
)
from gavit_tpu.models.vit import build_model, init_params
from gavit_tpu.parallel.mesh import make_mesh, shard_batch
from gavit_tpu.parallel.tp import model_param_specs, shard_model_params


def test_expert_capacity_static():
    assert expert_capacity(tokens=197, num_experts=8, k=2,
                           capacity_factor=1.25) == 62
    assert expert_capacity(16, 1, 1, 1.0) == 16
    # clamped to the token count and to >= 1
    assert expert_capacity(16, 1, 4, 8.0) == 16
    assert expert_capacity(4, 64, 1, 1.0) == 1


def test_router_dispatch_invariants():
    g, s, e, k, cap = 2, 24, 4, 2, 5
    logits = jax.random.normal(jax.random.key(0), (g, s, e))
    combine, aux = router_dispatch(logits, k, cap)
    assert combine.shape == (g, s, e, cap)
    dispatch = np.asarray(combine > 0, np.float32)
    # every expert slot holds at most one token
    assert (dispatch.sum(axis=1) <= 1.0 + 1e-6).all()
    # no expert receives more than its capacity
    assert (dispatch.sum(axis=(1, 3)) <= cap + 1e-6).all()
    # a token kept by both its choices carries normalised gates summing to 1
    per_token = np.asarray(combine).sum(axis=(2, 3))
    kept_both = dispatch.sum(axis=(2, 3)) == k
    np.testing.assert_allclose(per_token[kept_both], 1.0, atol=1e-6)
    # gates are convex weights everywhere (dropped tokens sum below 1)
    assert (per_token <= 1.0 + 1e-6).all() and (per_token >= 0).all()
    for v in aux.values():
        assert np.isfinite(float(v))
    # a uniform router scores load_balance == 1 regardless of expert count
    uniform = jnp.zeros((g, s, e))
    _, aux_u = router_dispatch(uniform, k, cap)
    np.testing.assert_allclose(float(aux_u["load_balance"]), 1.0, atol=1e-5)


def test_moe_mlp_matches_dense_when_single_expert():
    """E=1, k=1, cf=1.0: every token goes to the one expert at full
    capacity with gate 1.0 — the MoE MLP IS the dense MLP."""
    cfg = MoEConfig(enabled=True, num_experts=1, k=1, capacity_factor=1.0)
    mod = MoEMlp(cfg=cfg, hidden_dim=32, out_dim=16, drop=0.0)
    x = jax.random.normal(jax.random.key(1), (2, 9, 16))
    variables = mod.init(jax.random.key(2), x)
    out = mod.apply(variables, x, deterministic=True)

    p = variables["params"]
    w1, b1 = p["fc1_kernel"][0], p["fc1_bias"][0]
    w2, b2 = p["fc2_kernel"][0], p["fc2_bias"][0]
    ref = jax.nn.gelu(x @ w1 + b1, approximate=False) @ w2 + b2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def _moe_model_cfg(**moe_overrides):
    moe = {"enabled": True, "num_experts": 4, "k": 2,
           "capacity_factor": 1.5, "every": 2}
    moe.update(moe_overrides)
    return from_dict({"model": {
        "name": "custom", "img_size": 16, "patch_size": 8, "embed_dim": 32,
        "depth": 4, "num_heads": 4, "num_classes": 14, "drop_rate": 0.1,
        "moe": moe,
    }})


def test_moe_vit_sites_params_and_forward():
    cfg = _moe_model_cfg()
    assert cfg.model.moe_sites() == (1, 3)
    assert from_dict({"model": {"depth": 6, "moe": {
        "enabled": True, "insert_at": [2, 5]}}}).model.moe_sites() == (2, 5)

    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    assert "moe" in params["blocks_1"] and "moe" in params["blocks_3"]
    assert "mlp" in params["blocks_0"] and "moe" not in params["blocks_0"]
    assert params["blocks_1"]["moe"]["fc1_kernel"].shape == (4, 32, 128)

    x = jax.random.normal(jax.random.key(1), (4, 16, 16, 3))
    logits, mvars = model.apply(
        {"params": params}, x, deterministic=True, mutable=["moe_losses"])
    assert logits.shape == (4, 14)
    assert np.isfinite(np.asarray(logits)).all()
    aux = moe_aux_loss(mvars)
    assert np.isfinite(float(aux)) and float(aux) > 0.0
    # eval/serving path: without the mutable collection the sow is a no-op
    logits2 = model.apply({"params": params}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(logits2), np.asarray(logits),
                               atol=0)


def _make_trainer(tmp_path, mesh_cfg, *, remat=False, accum=1):
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.training import Trainer

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 4, "num_heads": 4,
                  "num_classes": 14, "drop_rate": 0.0, "remat": remat,
                  "moe": {"enabled": True, "num_experts": 4, "k": 2,
                          "capacity_factor": 1.5, "every": 2}},
        "data": {"batch_size": 16, "image_size": 16},
        "training": {"epochs": 1, "warmup_epochs": 1, "precision": "fp32",
                     "grad_accum_steps": accum},
        "mesh": mesh_cfg,
        "paths": {"save_dir": str(tmp_path / "ckpt"),
                  "log_dir": str(tmp_path / "logs")},
    })
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    ds = SyntheticChestXrayDataset(size=16, image_size=16, seed=0)
    loader = DataLoader(ds, 16, num_workers=0)
    return Trainer(model, params, loader, loader, cfg)


def test_moe_trainer_step_learns_router(tmp_path):
    """Trainer steps under remat AND grad-accum (sown aux losses thread the
    lifted transform and the scanned microbatches): finite loss, and the
    router receives gradient (the aux loss reaches the objective)."""
    tr = _make_trainer(tmp_path, {"data": 8, "model": 1}, remat=True,
                       accum=2)
    images, labels = next(iter(tr.train_loader))
    batch = shard_batch(tr.mesh, (images, labels))
    before = np.asarray(tr.state.params["model"]["blocks_1"]["moe"]["router"])
    # two steps: LR warmup makes the step-0 update exactly zero
    state, metrics, _ = tr._train_step(tr.state, tr.base_rng, *batch)
    assert np.isfinite(float(metrics["loss"]))
    state, metrics, _ = tr._train_step(state, tr.base_rng, *batch)
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(state.params["model"]["blocks_1"]["moe"]["router"])
    assert np.abs(after - before).max() > 0.0
    # the (weighted) aux loss is surfaced in the step metrics
    assert "moe_aux" in metrics and np.isfinite(float(metrics["moe_aux"]))
    assert float(metrics["moe_aux"]) > 0.0


def test_ep_specs_and_forward_matches_single_device():
    cfg = _moe_model_cfg()
    model = build_model(cfg.model, precision="fp32", attn_impl="xla")
    params = init_params(model, jax.random.key(0))
    specs = model_param_specs(params)
    assert specs["blocks_1"]["moe"]["fc1_kernel"] == P("model", None, None)
    assert specs["blocks_1"]["moe"]["fc2_bias"] == P("model", None)
    assert specs["blocks_1"]["moe"]["router"] == P()

    x = jax.random.normal(jax.random.key(1), (8, 16, 16, 3))
    ref = np.asarray(model.apply({"params": params}, x, deterministic=True))

    mesh = make_mesh(MeshConfig(data=2, model=4))
    ep_params = shard_model_params(params, mesh)
    fc1 = ep_params["blocks_1"]["moe"]["fc1_kernel"]
    assert fc1.addressable_shards[0].data.shape[0] == 1  # 4 experts / 4
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def fwd(p, x):
        return model.apply({"params": p}, x, deterministic=True)

    with jax.set_mesh(mesh):
        out = np.asarray(fwd(ep_params, xs))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_ep_trainer_step_matches_dp(tmp_path):
    """dp2×ep4 (+ Megatron TP on the dense blocks) reproduces the dp-only
    update — expert parallelism is a config change."""
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset

    images, labels = next(iter(DataLoader(
        SyntheticChestXrayDataset(size=16, image_size=16, seed=0), 16,
        num_workers=0,
    )))
    results = {}
    for name, mesh_cfg in [("dp", {"data": 8, "model": 1}),
                           ("ep", {"data": 2, "model": 4})]:
        tr = _make_trainer(tmp_path / name, mesh_cfg)
        batch = shard_batch(tr.mesh, (images, labels))
        state, metrics, _ = tr._train_step(tr.state, tr.base_rng, *batch)
        results[name] = (state, float(metrics["loss"]))

    ep_state, ep_loss = results["ep"]
    dp_state, dp_loss = results["dp"]
    np.testing.assert_allclose(ep_loss, dp_loss, atol=1e-5)
    a = ep_state.params["model"]["blocks_1"]["moe"]["fc1_kernel"]
    b = dp_state.params["model"]["blocks_1"]["moe"]["fc1_kernel"]
    # the updated expert bank still lives expert-sharded on the mesh
    assert a.addressable_shards[0].data.shape[0] == 1
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_moe_fsdp_ep_composition_matches_dp(tmp_path):
    """dp2×ep4 + ZeRO-3 FSDP on an MoE model reproduces the dp-only
    update, with the expert bank sharded on BOTH axes (E over 'model',
    a free dim over 'data')."""
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset

    images, labels = next(iter(DataLoader(
        SyntheticChestXrayDataset(size=16, image_size=16, seed=0), 16,
        num_workers=0,
    )))
    results = {}
    for name, mesh_cfg in [
        ("dp", {"data": 8, "model": 1}),
        ("fsdp_ep", {"data": 2, "model": 4, "fsdp": True,
                     "fsdp_min_size": 512}),
    ]:
        tr = _make_trainer(tmp_path / name, mesh_cfg)
        batch = shard_batch(tr.mesh, (images, labels))
        state, metrics, _ = tr._train_step(tr.state, tr.base_rng, *batch)
        results[name] = (state, float(metrics["loss"]))

    fe_state, fe_loss = results["fsdp_ep"]
    dp_state, dp_loss = results["dp"]
    np.testing.assert_allclose(fe_loss, dp_loss, atol=1e-5)
    bank = fe_state.params["model"]["blocks_1"]["moe"]["fc1_kernel"]
    spec = str(bank.sharding.spec)
    assert "model" in spec and "data" in spec, spec
    assert bank.addressable_shards[0].data.size == bank.size // 8
    np.testing.assert_allclose(
        np.asarray(bank),
        np.asarray(dp_state.params["model"]["blocks_1"]["moe"]["fc1_kernel"]),
        atol=5e-5)


def test_moe_guards():
    from gavit_tpu.models.tome import tome_forward
    from gavit_tpu.parallel.pp import make_pipe_mesh, pipeline_apply

    cfg = _moe_model_cfg()
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    x = jnp.zeros((2, 16, 16, 3))
    with pytest.raises(ValueError, match="dense trunk"):
        tome_forward(cfg.model, params, x, r=2)
    with pytest.raises(ValueError, match="moe.enabled"):
        pipeline_apply(make_pipe_mesh(4, 2), cfg.model, params, x,
                       num_microbatches=2)

    # indivisible expert count under EP fails loudly at Trainer build
    import pathlib
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        with pytest.raises(ValueError, match="divisible"):
            _trainer_bad_experts(pathlib.Path(td))


def test_moe_predictor_bucket_padding_invariant():
    """The serving path works on an MoE model, and bucket padding does not
    perturb real rows — per-image routing groups make expert capacity
    batch-size invariant."""
    from gavit_tpu.serving import Predictor

    cfg = from_dict({"model": {
        "name": "custom", "img_size": 16, "patch_size": 8, "embed_dim": 32,
        "depth": 4, "num_heads": 4, "num_classes": 14,
        "moe": {"enabled": True, "num_experts": 4, "k": 2,
                "capacity_factor": 1.5, "every": 2},
    }, "data": {"image_size": 16}})
    pred = Predictor(cfg, precision="fp32", buckets=(4, 8))
    imgs = np.random.default_rng(7).integers(
        0, 256, (8, 16, 16, 3), dtype=np.uint8)
    full = pred.predict_proba(imgs)
    part = pred.predict_proba(imgs[:5])          # padded 5 -> 8
    assert full.shape == (8, 14) and ((full > 0) & (full < 1)).all()
    np.testing.assert_allclose(part, full[:5], atol=1e-6)


def test_moe_int8_serving_composition():
    """Static-int8 serving on an MoE model: the dense GEMMs (patch embed,
    qkv/proj, dense-block MLPs, head) quantise after calibration while the
    expert GEMMs stay in the compute dtype — the composition serves."""
    from gavit_tpu.serving import Predictor

    cfg = from_dict({"model": {
        "name": "custom", "img_size": 16, "patch_size": 8, "embed_dim": 32,
        "depth": 4, "num_heads": 4, "num_classes": 14,
        "moe": {"enabled": True, "num_experts": 4, "k": 2,
                "capacity_factor": 1.5, "every": 2},
    }, "data": {"image_size": 16}})
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8)

    fp = Predictor(cfg, precision="fp32", buckets=(8,))
    q = Predictor(cfg, precision="int8", buckets=(8,),
                  params=fp.params)
    q.calibrate(imgs)
    probs = q.predict_proba(imgs)
    ref = fp.predict_proba(imgs)
    assert probs.shape == (8, 14) and np.isfinite(probs).all()
    # int8 noise on the dense GEMMs only — probabilities stay close
    assert np.abs(probs - ref).max() < 0.1


def test_upcycled_moe_equals_dense():
    """Sparse upcycling: an MoE model initialised from a trained dense tree
    (experts = copies of the dense MLP, zero router) reproduces the dense
    forward exactly when capacity_factor >= E/k (uniform routing drops
    nothing), and continues training from that function."""
    import dataclasses

    from gavit_tpu.models.moe import upcycle_params

    moe_cfg = _moe_model_cfg(num_experts=4, k=2, capacity_factor=2.0)
    dense_cfg = dataclasses.replace(
        moe_cfg.model, moe=MoEConfig(enabled=False))

    dense_model = build_model(dense_cfg, precision="fp32")
    dense_params = init_params(dense_model, jax.random.key(0))
    moe_model = build_model(moe_cfg.model, precision="fp32")
    moe_init = init_params(moe_model, jax.random.key(1))

    up = upcycle_params(dense_params, moe_init, moe_cfg.model)
    # non-MoE leaves copied from the dense tree verbatim
    np.testing.assert_array_equal(
        np.asarray(up["blocks_0"]["mlp"]["fc1"]["kernel"]),
        np.asarray(dense_params["blocks_0"]["mlp"]["fc1"]["kernel"]))
    assert float(jnp.abs(up["blocks_1"]["moe"]["router"]).max()) == 0.0

    x = jax.random.normal(jax.random.key(2), (4, 16, 16, 3))
    ref = dense_model.apply({"params": dense_params}, x, deterministic=True)
    out = moe_model.apply({"params": up}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_example_moe_config_loads():
    import pathlib

    from gavit_tpu.config import load_config

    path = (pathlib.Path(__file__).resolve().parent.parent
            / "configs" / "examples" / "vit_b16_moe.yaml")
    cfg = load_config(str(path))
    m = cfg.model.moe
    assert m.enabled and m.num_experts == 8 and m.k == 2
    assert cfg.model.moe_sites() == (1, 3, 5, 7, 9, 11)
    assert m.num_experts % cfg.mesh.model == 0


def _trainer_bad_experts(tmp_path):
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.training import Trainer

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 2, "num_heads": 2,
                  "num_classes": 14,
                  "moe": {"enabled": True, "num_experts": 3}},
        "data": {"batch_size": 16, "image_size": 16},
        "training": {"epochs": 1, "warmup_epochs": 1, "precision": "fp32"},
        "mesh": {"data": 2, "model": 4},
        "paths": {"save_dir": str(tmp_path / "ckpt"),
                  "log_dir": str(tmp_path / "logs")},
    })
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    ds = SyntheticChestXrayDataset(size=16, image_size=16, seed=0)
    loader = DataLoader(ds, 16, num_workers=0)
    return Trainer(model, params, loader, loader, cfg)
