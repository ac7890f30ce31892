"""Tensor parallelism as a config change: TP-sharded params under jit must
reproduce single-device logits exactly (GSPMD distributes the matmuls and
inserts the collectives)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gavit_tpu.config import MeshConfig, from_dict
from gavit_tpu.models.vit import build_model, init_params
from gavit_tpu.parallel.mesh import make_mesh
from gavit_tpu.parallel.tp import model_param_specs, shard_model_params


def _setup():
    cfg = from_dict({"model": {
        "name": "custom", "img_size": 16, "patch_size": 8, "embed_dim": 32,
        "depth": 2, "num_heads": 4, "num_classes": 14, "drop_rate": 0.0,
        "graph": {"enabled": True, "num_blocks": 1, "adjacency": "knn",
                  "k": 2},
    }})
    # the Pallas kernel is opaque to GSPMD; TP uses the XLA attention path
    model = build_model(cfg.model, precision="fp32", attn_impl="xla")
    params = init_params(model, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (8, 16, 16, 3))
    return model, params, x


def test_specs_shapes():
    _, params, _ = _setup()
    specs = model_param_specs(params)
    assert specs["blocks_0"]["attn"]["qkv"]["kernel"] == P(None, "model")
    assert specs["blocks_0"]["attn"]["qkv"]["bias"] == P("model")
    assert specs["blocks_0"]["attn"]["proj"]["kernel"] == P("model", None)
    assert specs["blocks_0"]["attn"]["proj"]["bias"] == P()
    assert specs["blocks_0"]["mlp"]["fc1"]["kernel"] == P(None, "model")
    assert specs["blocks_0"]["mlp"]["fc2"]["kernel"] == P("model", None)
    assert specs["pos_embed"] == P()
    assert specs["head"]["kernel"] == P()


def test_tp_matches_single_device():
    model, params, x = _setup()
    ref = np.asarray(model.apply({"params": params}, x, deterministic=True))

    mesh = make_mesh(MeshConfig(data=2, model=4))
    assert mesh.devices.shape == (2, 4)
    tp_params = shard_model_params(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def fwd(p, x):
        return model.apply({"params": p}, x, deterministic=True)

    out = np.asarray(fwd(tp_params, xs))
    np.testing.assert_allclose(out, ref, atol=2e-5)
    # kernels are actually distributed (one shard holds 1/4 of the features)
    qkv = tp_params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.addressable_shards[0].data.shape[1] == qkv.shape[1] // 4


def test_tp_gradients_match():
    model, params, x = _setup()

    def loss(p, x):
        return jnp.sum(model.apply({"params": p}, x, deterministic=True) ** 2)

    g_ref = jax.grad(loss)(params, x)
    mesh = make_mesh(MeshConfig(data=2, model=4))
    tp_params = shard_model_params(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    g_tp = jax.jit(jax.grad(loss))(tp_params, xs)
    np.testing.assert_allclose(
        np.asarray(g_tp["blocks_0"]["mlp"]["fc1"]["kernel"]),
        np.asarray(g_ref["blocks_0"]["mlp"]["fc1"]["kernel"]),
        atol=2e-4,
    )


def test_tp_training_step_matches_dp(tmp_path):
    """TP is a *training* config change, not just a forward one: a full
    Trainer step (aug + fwd + loss + bwd + AdamW) on a (data=4, model=2)
    mesh must reproduce the dp-only update, with params and adam moments
    actually living column/row-sharded over 'model'."""
    from gavit_tpu.config import from_dict
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.parallel.mesh import shard_batch
    from gavit_tpu.training import Trainer

    def make(mesh_cfg, impl):
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
        model = build_model(cfg.model, precision="fp32", **impl)
        params = init_params(model, jax.random.key(0))
        ds = SyntheticChestXrayDataset(size=16, image_size=16, seed=0)
        loader = DataLoader(ds, 16, num_workers=0)
        return cfg, Trainer(model, params, loader, loader, cfg)

    images, labels = next(iter(DataLoader(
        SyntheticChestXrayDataset(size=16, image_size=16, seed=0), 16,
        num_workers=0,
    )))

    results = {}
    for name, mesh_cfg, impl in [
        ("dp", {"data": 8, "model": 1}, {}),
        ("tp", {"data": 4, "model": 2},
         {"attn_impl": "xla", "graph_impl": "xla"}),
    ]:
        cfg, tr = make(mesh_cfg, impl)
        batch = shard_batch(tr.mesh, (images, labels))
        state, metrics, _ = tr._train_step(tr.state, tr.base_rng, *batch)
        results[name] = (state, float(metrics["loss"]))

    tp_state, tp_loss = results["tp"]
    dp_state, dp_loss = results["dp"]
    np.testing.assert_allclose(tp_loss, dp_loss, atol=1e-5)

    qkv = tp_state.params["model"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert "model" in str(qkv.sharding.spec)
    assert qkv.addressable_shards[0].data.shape[1] == qkv.shape[1] // 2
    # adam moments inherited the param shardings via GSPMD propagation
    mu = jax.tree.leaves(jax.tree.map(
        lambda x: x.sharding, tp_state.opt_state, is_leaf=lambda x: hasattr(x, "sharding")
    ))
    assert any("model" in str(s.spec) for s in mu)

    for key in (("blocks_0", "attn", "qkv", "kernel"),
                ("blocks_0", "mlp", "fc2", "kernel"),
                ("head", "kernel")):
        a = tp_state.params["model"]
        b = dp_state.params["model"]
        for k in key:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_tp_with_grad_accum_and_remat(tmp_path):
    """Feature composition: a dp×tp mesh + grad_accum_steps=2 + model.remat
    in one training step must still reproduce the plain dp update."""
    from gavit_tpu.config import from_dict
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.parallel.mesh import shard_batch
    from gavit_tpu.training import Trainer

    def make(mesh_cfg, impl, accum, remat):
        cfg = from_dict({
            "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                      "embed_dim": 32, "depth": 2, "num_heads": 2,
                      "num_classes": 14, "drop_rate": 0.0, "remat": remat,
                      "graph": {"enabled": True, "num_blocks": 1,
                                "adjacency": "knn", "k": 2}},
            "data": {"batch_size": 16, "image_size": 16},
            "training": {"epochs": 1, "warmup_epochs": 1, "precision": "fp32",
                         "grad_accum_steps": accum},
            "mesh": mesh_cfg,
            "paths": {"save_dir": str(tmp_path / "ckpt"),
                      "log_dir": str(tmp_path / "logs")},
        })
        model = build_model(cfg.model, precision="fp32", **impl)
        params = init_params(model, jax.random.key(0))
        ds = SyntheticChestXrayDataset(size=16, image_size=16, seed=0)
        loader = DataLoader(ds, 16, num_workers=0)
        return Trainer(model, params, loader, loader, cfg)

    images, labels = next(iter(DataLoader(
        SyntheticChestXrayDataset(size=16, image_size=16, seed=0), 16,
        num_workers=0,
    )))

    tr_ref = make({"data": 8, "model": 1}, {}, 1, False)
    batch = shard_batch(tr_ref.mesh, (images, labels))
    ref_state, ref_m, _ = tr_ref._train_step(tr_ref.state, tr_ref.base_rng,
                                             *batch)

    tr = make({"data": 4, "model": 2},
              {"attn_impl": "xla", "graph_impl": "xla"}, 2, True)
    batch = shard_batch(tr.mesh, (images, labels))
    state, m, _ = tr._train_step(tr.state, tr.base_rng, *batch)

    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               atol=1e-5)
    a = state.params["model"]["blocks_0"]["mlp"]["fc1"]["kernel"]
    b = ref_state.params["model"]["blocks_0"]["mlp"]["fc1"]["kernel"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_tp_validate_and_checkpoint_roundtrip(tmp_path):
    """Under a dp×tp mesh the full Trainer surface works: validate() runs
    the eval step on TP-sharded params, and checkpoints save/restore
    (restore re-shards through the TP state sharding)."""
    from gavit_tpu.config import from_dict
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.training import Trainer
    from gavit_tpu.utils import checkpoint as ckpt_lib

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 2, "num_heads": 2,
                  "num_classes": 14, "drop_rate": 0.0,
                  "graph": {"enabled": True, "num_blocks": 1,
                            "adjacency": "knn", "k": 2}},
        "data": {"batch_size": 16, "image_size": 16},
        "training": {"epochs": 1, "warmup_epochs": 1, "precision": "fp32"},
        "mesh": {"data": 4, "model": 2},
        "paths": {"save_dir": str(tmp_path / "ck"),
                  "log_dir": str(tmp_path / "lg")},
    })
    model = build_model(cfg.model, precision="fp32", attn_impl="xla",
                        graph_impl="xla")
    params = init_params(model, jax.random.key(0))
    ds = SyntheticChestXrayDataset(size=32, image_size=16, seed=0)
    loader = DataLoader(ds, 16, num_workers=0)
    tr = Trainer(model, params, loader, loader, cfg)

    vm = tr.validate()
    assert np.isfinite(vm["loss"]) and 0.0 <= vm["mean_auc"] <= 1.0

    tr.save_checkpoint({"mean_auc": 0.5}, is_best=True)
    ckpt_lib.wait_for_saves()
    before = np.asarray(
        tr.state.params["model"]["blocks_0"]["attn"]["qkv"]["kernel"]
    )
    tr.restore_checkpoint(str(tmp_path / "ck" / "best_model"))
    qkv = tr.state.params["model"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert "model" in str(qkv.sharding.spec)  # re-sharded on restore
    np.testing.assert_allclose(np.asarray(qkv), before)


def test_tp_training_step_with_fused_kernels_matches_dp(tmp_path):
    """TP keeps the fused Pallas attention + graph kernels: the default
    (auto→pallas) impls on a dp×tp mesh must reproduce the dp-only pallas
    update. The Trainer traces under jax.set_mesh, the Attention layer pins
    heads to 'model', and the head-partitioned rules run local heads
    (parallel/op_sharding.py). The fused MLP megakernel also stays: its 'f'
    contraction factor runs it on each chip's Megatron hidden shard (the r3
    Trainer override to 'xla' is gone)."""
    from gavit_tpu.config import from_dict
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.parallel.mesh import shard_batch
    from gavit_tpu.training import Trainer

    def make(mesh_cfg):
        cfg = from_dict({
            "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                      "embed_dim": 32, "depth": 2, "num_heads": 2,
                      "num_classes": 14, "drop_rate": 0.0,
                      "graph": {"enabled": True, "num_blocks": 1,
                                "adjacency": "knn", "k": 2}},
            "data": {"batch_size": 16, "image_size": 16},
            "training": {"epochs": 1, "warmup_epochs": 1,
                         "precision": "fp32"},
            "mesh": mesh_cfg,
            "paths": {"save_dir": str(tmp_path / "ckpt"),
                      "log_dir": str(tmp_path / "logs")},
        })
        model = build_model(cfg.model, precision="fp32")  # default impls
        params = init_params(model, jax.random.key(0))
        ds = SyntheticChestXrayDataset(size=16, image_size=16, seed=0)
        loader = DataLoader(ds, 16, num_workers=0)
        return Trainer(model, params, loader, loader, cfg)

    images, labels = next(iter(DataLoader(
        SyntheticChestXrayDataset(size=16, image_size=16, seed=0), 16,
        num_workers=0,
    )))

    results = {}
    for name, mesh_cfg in [("dp", {"data": 8, "model": 1}),
                           ("tp", {"data": 4, "model": 2})]:
        tr = make(mesh_cfg)
        if name == "tp":
            assert tr.model.mlp_impl == "auto"  # megakernel KEPT under TP
            assert tr.model.attn_impl == "auto"  # fused kernels KEPT
        batch = shard_batch(tr.mesh, (images, labels))
        state, metrics, _ = tr._train_step(tr.state, tr.base_rng, *batch)
        results[name] = (state, float(metrics["loss"]))

    tp_state, tp_loss = results["tp"]
    dp_state, dp_loss = results["dp"]
    np.testing.assert_allclose(tp_loss, dp_loss, atol=1e-5)
    for key in (("blocks_0", "attn", "qkv", "kernel"),
                ("blocks_0", "attn", "proj", "kernel"),
                ("head", "kernel")):
        a, b = tp_state.params["model"], dp_state.params["model"]
        for k in key:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_head_sharded_attention_no_allgather_and_grad_match():
    """The v3 kernel under dp×tp runs head-locally: zero all-gathers in the
    compiled HLO, outputs head-sharded, forward and gradient equal to the
    single-device (v4 flat) path."""
    from gavit_tpu.ops.attention import fused_qkv_attention
    from gavit_tpu.parallel.op_sharding import head_shard_constraint

    mesh = make_mesh(MeshConfig(data=4, model=2))
    b, n, h, d = 8, 13, 4, 8
    qkv = jax.random.normal(jax.random.key(0), (b, n, 3, h, d), jnp.float32)

    def loss(qkv):
        q = head_shard_constraint(qkv, head_dim=3)
        o = fused_qkv_attention(q, 0.35, merge_heads=False)
        return jnp.sum(o ** 2), o

    # no mesh context → v4 flat path, single device
    gref, oref = jax.jit(jax.grad(loss, has_aux=True))(qkv)
    xs = jax.device_put(qkv, NamedSharding(mesh, P("data")))
    with jax.set_mesh(mesh):
        fn = jax.jit(jax.grad(loss, has_aux=True))
        g, o = fn(xs)
        hlo = fn.lower(xs).compile().as_text()
    assert "model" in str(o.sharding.spec), o.sharding
    assert not [l for l in hlo.splitlines() if "all-gather" in l]
    np.testing.assert_allclose(np.asarray(o), np.asarray(oref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), atol=2e-5)


def test_head_shard_constraint_indivisible_heads_noop():
    """h % tp != 0 → the constraint declines and the kernels replicate
    heads (correct, just not head-parallel)."""
    from gavit_tpu.ops.attention import fused_qkv_attention
    from gavit_tpu.parallel.op_sharding import head_shard_constraint

    mesh = make_mesh(MeshConfig(data=4, model=2))
    qkv = jax.random.normal(jax.random.key(0), (8, 13, 3, 3, 8), jnp.float32)

    def f(qkv):
        q = head_shard_constraint(qkv, head_dim=3)  # 3 heads, tp=2
        return fused_qkv_attention(q, 0.35, merge_heads=False)

    ref = np.asarray(jax.jit(f)(qkv))
    xs = jax.device_put(qkv, NamedSharding(mesh, P("data")))
    with jax.set_mesh(mesh):
        out = jax.jit(f)(xs)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_mlp_fused_dispatch_skips_tp_context(monkeypatch):
    """The DETERMINISTIC (serving) megakernel still steps aside under TP —
    only the training op carries the 'f' Megatron factor; inference under
    TP takes the GSPMD XLA chain (TPU-only dispatch decision, pinned with
    a sentinel rather than the HLO since the CPU path short-circuits
    before the wrapper)."""
    import gavit_tpu.ops.mlp as mlp_ops
    from gavit_tpu.models.layers import Mlp
    from gavit_tpu.ops.mlp import pick_block

    d, f, b, n = 256, 1024, 8, 64
    assert pick_block(b * n, d, f, 2) is not None  # megakernel-eligible
    mlp = Mlp(hidden_dim=f, out_dim=d, dtype=jnp.bfloat16, impl="auto")
    x = jax.random.normal(jax.random.key(0), (b, n, d), jnp.float32)
    params = mlp.init(jax.random.key(1), x, deterministic=True)
    ref = jax.jit(lambda p, x: mlp.apply(p, x, deterministic=True))(params, x)

    calls = []

    def sentinel(*args, **kw):
        calls.append(1)
        return mlp_ops._chain_infer(
            args[0].reshape(-1, args[0].shape[-1]), args[1],
            args[2].reshape(1, -1), args[3], args[4].reshape(1, -1),
            args[5] if len(args) > 5 else True,
        ).reshape(args[0].shape)

    monkeypatch.setattr(mlp_ops, "fused_mlp_inference", sentinel)
    # outside any TP context the fused serving path MUST engage
    mlp.apply(params, x, deterministic=True)
    assert calls, "fused serving path did not engage outside TP"

    calls.clear()
    mesh = make_mesh(MeshConfig(data=4, model=2))
    specs = {"params": {
        "fc1": {"kernel": P(None, "model"), "bias": P("model")},
        "fc2": {"kernel": P("model", None), "bias": P()},
    }}
    sp = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                      is_leaf=lambda v: isinstance(v, P))
    tp_params = jax.device_put(params, sp)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, x: mlp.apply(p, x, deterministic=True))(
            tp_params, xs)
    assert not calls, "fused serving path engaged under a >1 'model' axis"
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_sp_training_step_matches_dp(tmp_path):
    """Sequence parallelism (config mesh.sp): the Trainer clones the model
    with sp=True under a >1 'model' axis, the residual stream carries
    token-sharding constraints, and the full train step still reproduces
    the dp-only update exactly (drop_rate 0 — dropout masks are sharding-
    dependent by design)."""
    from gavit_tpu.config import from_dict
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.parallel.mesh import shard_batch
    from gavit_tpu.training import Trainer

    def make(mesh_cfg, impl):
        cfg = from_dict({
            "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                      "embed_dim": 32, "depth": 2, "num_heads": 2,
                      "num_classes": 14, "drop_rate": 0.0,
                      "graph": {"enabled": True, "num_blocks": 1,
                                "adjacency": "knn", "k": 2}},
            "data": {"batch_size": 16, "image_size": 16},
            "training": {"epochs": 1, "warmup_epochs": 1,
                         "precision": "fp32"},
            "mesh": mesh_cfg,
            "paths": {"save_dir": str(tmp_path / "ckpt"),
                      "log_dir": str(tmp_path / "logs")},
        })
        model = build_model(cfg.model, precision="fp32", **impl)
        params = init_params(model, jax.random.key(0))
        ds = SyntheticChestXrayDataset(size=16, image_size=16, seed=0)
        loader = DataLoader(ds, 16, num_workers=0)
        return cfg, Trainer(model, params, loader, loader, cfg)

    images, labels = next(iter(DataLoader(
        SyntheticChestXrayDataset(size=16, image_size=16, seed=0), 16,
        num_workers=0,
    )))

    results = {}
    for name, mesh_cfg, impl in [
        ("dp", {"data": 8, "model": 1}, {}),
        ("sp", {"data": 4, "model": 2, "sp": True},
         {"attn_impl": "xla", "graph_impl": "xla"}),
    ]:
        cfg, tr = make(mesh_cfg, impl)
        if name == "sp":
            assert tr.model.sp, "Trainer did not enable sp from mesh.sp"
        batch = shard_batch(tr.mesh, (images, labels))
        state, metrics, _ = tr._train_step(tr.state, tr.base_rng, *batch)
        results[name] = (state, float(metrics["loss"]))

    sp_state, sp_loss = results["sp"]
    dp_state, dp_loss = results["dp"]
    np.testing.assert_allclose(sp_loss, dp_loss, atol=1e-5)
    for key in (("blocks_0", "attn", "qkv", "kernel"),
                ("blocks_1", "mlp", "fc2", "kernel"),
                ("head", "kernel")):
        a, b = sp_state.params["model"], dp_state.params["model"]
        for k in key:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_sp_with_fsdp_grad_accum_and_remat(tmp_path):
    """Full composition: dp×tp mesh + sequence parallelism + ZeRO-3 FSDP +
    grad_accum_steps=2 + model.remat in one training step reproduces the
    plain dp update (the dryrun gates the same stack; this pins it in CI)."""
    from gavit_tpu.config import from_dict
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.parallel.mesh import shard_batch
    from gavit_tpu.training import Trainer

    def make(mesh_cfg, impl, accum, remat):
        cfg = from_dict({
            "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                      "embed_dim": 32, "depth": 2, "num_heads": 2,
                      "num_classes": 14, "drop_rate": 0.0, "remat": remat,
                      "graph": {"enabled": True, "num_blocks": 1,
                                "adjacency": "knn", "k": 2}},
            "data": {"batch_size": 16, "image_size": 16},
            "training": {"epochs": 1, "warmup_epochs": 1,
                         "precision": "fp32", "grad_accum_steps": accum},
            "mesh": mesh_cfg,
            "paths": {"save_dir": str(tmp_path / "ckpt"),
                      "log_dir": str(tmp_path / "logs")},
        })
        model = build_model(cfg.model, precision="fp32", **impl)
        params = init_params(model, jax.random.key(0))
        ds = SyntheticChestXrayDataset(size=16, image_size=16, seed=0)
        loader = DataLoader(ds, 16, num_workers=0)
        return Trainer(model, params, loader, loader, cfg)

    images, labels = next(iter(DataLoader(
        SyntheticChestXrayDataset(size=16, image_size=16, seed=0), 16,
        num_workers=0,
    )))

    tr_ref = make({"data": 8, "model": 1}, {}, 1, False)
    batch = shard_batch(tr_ref.mesh, (images, labels))
    ref_state, ref_m, _ = tr_ref._train_step(tr_ref.state, tr_ref.base_rng,
                                             *batch)

    tr = make({"data": 4, "model": 2, "sp": True, "fsdp": True,
               "fsdp_min_size": 512},
              {"attn_impl": "xla", "graph_impl": "xla"}, 2, True)
    assert tr.model.sp
    batch = shard_batch(tr.mesh, (images, labels))
    state, m, _ = tr._train_step(tr.state, tr.base_rng, *batch)

    np.testing.assert_allclose(float(m["loss"]), float(ref_m["loss"]),
                               atol=1e-5)
    a = state.params["model"]["blocks_0"]["mlp"]["fc1"]["kernel"]
    b = ref_state.params["model"]["blocks_0"]["mlp"]["fc1"]["kernel"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)
