"""Dropless grouped-GEMM MoE execution (ops/moe_grouped.py, moe.impl).

Pins: the expert-grouping permutation invariants, exact forward/gradient
agreement with a dense per-choice formulation, the dropless contract (small
capacity factors drop tokens on the dense path but never on the grouped
path), dp shard_map execution == single-device math, the Trainer
composition, and expert parallelism (dp×ep == single-device incl. grads;
per-expert — not cascading — capacity drops past the ep bound). The
megablox row-padding bookkeeping is exercised in interpret mode.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from gavit_tpu.config import MeshConfig, MoEConfig, from_dict
from gavit_tpu.models.moe import MoEMlp, router_topk
from gavit_tpu.ops.moe_grouped import (
    group_by_expert,
    grouped_moe_mlp,
    ragged_matmul,
)
from gavit_tpu.parallel.mesh import make_mesh, shard_batch


def _toy(seed=0, g=3, s=17, d=16, f=32, e=4, k=2):
    rng = np.random.RandomState(seed)
    x = jnp.array(rng.randn(g, s, d), jnp.float32)
    logits = jnp.array(rng.randn(g, s, e), jnp.float32)
    w1 = jnp.array(rng.randn(e, d, f) * 0.1, jnp.float32)
    b1 = jnp.array(rng.randn(e, f) * 0.1, jnp.float32)
    w2 = jnp.array(rng.randn(e, f, d) * 0.1, jnp.float32)
    b2 = jnp.array(rng.randn(e, d) * 0.1, jnp.float32)
    gv, gi, _ = router_topk(logits, k)
    return x, gv, gi, (w1, b1, w2, b2)


def _dense_equiv(x, gv, gi, weights, e):
    """Per-choice reference: every expert applied to every token, one-hot
    selected — O(E·S) compute, unambiguously correct."""
    w1, b1, w2, b2 = weights
    oh = jax.nn.one_hot(gi, e, dtype=jnp.float32)
    h = jnp.einsum("gsd,edf->gsef", x, w1) + b1[None, None]
    h = jax.nn.gelu(h, approximate=False)
    y = jnp.einsum("gsef,efd->gsed", h, w2) + b2[None, None]
    yk = jnp.einsum("gske,gsed->gskd", oh, y)
    return jnp.sum(gv[..., None] * yk, axis=2)


def test_group_by_expert_invariants():
    _, _, gi, _ = _toy()
    e = 4
    dest, src, sizes = group_by_expert(gi, e)
    t = gi.size
    d = np.asarray(dest).reshape(-1)
    assert sorted(d) == list(range(t))                    # a permutation
    assert int(np.asarray(sizes).sum()) == t
    # inverse permutation round-trips
    np.testing.assert_array_equal(np.asarray(src)[d], np.arange(t))
    # rows are expert-contiguous: sorted expert ids are non-decreasing and
    # match the declared group sizes
    e_sorted = np.asarray(gi).reshape(-1)[np.asarray(src)]
    assert (np.diff(e_sorted) >= 0).all()
    np.testing.assert_array_equal(np.bincount(e_sorted, minlength=e),
                                  np.asarray(sizes))


def test_grouped_matches_dense_equivalent_forward_and_grads():
    x, gv, gi, weights = _toy()
    key = jax.random.PRNGKey(0)
    out = grouped_moe_mlp(x, gv, gi, *weights, key)
    ref = _dense_equiv(x, gv, gi, weights, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    t = jnp.array(np.random.RandomState(1).randn(*out.shape), jnp.float32)
    gg = jax.grad(lambda a: jnp.sum(t * grouped_moe_mlp(
        a[0], a[1], gi, *a[2:], key)))((x, gv) + weights)
    gd = jax.grad(lambda a: jnp.sum(t * _dense_equiv(
        a[0], a[1], gi, a[2:], 4)))((x, gv) + weights)
    for a, b in zip(gg, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_ragged_matmul_megablox_pad_bookkeeping():
    """The megablox path pads rows to the tile size and books them to the
    last group; outputs for real rows match ragged_dot exactly (interpret
    mode — the TPU path is benched on hardware)."""
    rng = np.random.RandomState(2)
    x = jnp.array(rng.randn(70, 16), jnp.float32)        # 70 % 128 != 0
    w = jnp.array(rng.randn(3, 16, 8), jnp.float32)
    sizes = jnp.array([20, 0, 50], jnp.int32)
    ref = ragged_matmul(x, w, sizes, impl="ragged_dot")
    out = ragged_matmul(x, w, sizes, impl="megablox", interpret=True)
    assert out.shape == ref.shape == (70, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def _moe_cfg(**over):
    base = dict(enabled=True, num_experts=4, k=2, capacity_factor=2.0)
    base.update(over)
    return MoEConfig(**base)


def test_grouped_module_matches_dense_impl_when_no_drops():
    """With capacity_factor >= E/k the dense path drops nothing, so the two
    engines compute the same function."""
    x = jax.random.normal(jax.random.key(1), (2, 24, 16))
    dense = MoEMlp(cfg=_moe_cfg(impl="dense"), hidden_dim=32, out_dim=16)
    grouped = MoEMlp(cfg=_moe_cfg(impl="grouped"), hidden_dim=32, out_dim=16)
    variables = dense.init(jax.random.key(2), x)
    ref, mv_d = dense.apply(variables, x, deterministic=True,
                            mutable=["moe_losses"])
    out, mv_g = grouped.apply(variables, x, deterministic=True,
                              mutable=["moe_losses"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # identical routing -> identical aux losses
    np.testing.assert_allclose(
        float(jax.tree.leaves(mv_g["moe_losses"])[0]),
        float(jax.tree.leaves(mv_d["moe_losses"])[0]), rtol=1e-6)


def test_grouped_is_dropless():
    """At a tiny capacity factor the dense path drops tokens; the grouped
    path ignores capacity entirely and still equals the no-drop function."""
    x = jax.random.normal(jax.random.key(3), (2, 64, 16))
    nodrop = MoEMlp(cfg=_moe_cfg(impl="dense", capacity_factor=2.0),
                    hidden_dim=32, out_dim=16)
    tight = MoEMlp(cfg=_moe_cfg(impl="dense", capacity_factor=0.5),
                   hidden_dim=32, out_dim=16)
    grouped = MoEMlp(cfg=_moe_cfg(impl="grouped", capacity_factor=0.5),
                     hidden_dim=32, out_dim=16)
    variables = nodrop.init(jax.random.key(4), x)
    full = np.asarray(nodrop.apply(variables, x, deterministic=True))
    dropped = np.asarray(tight.apply(variables, x, deterministic=True))
    out = np.asarray(grouped.apply(variables, x, deterministic=True))
    assert np.abs(dropped - full).max() > 1e-3     # the dense path dropped
    np.testing.assert_allclose(out, full, atol=1e-5)   # grouped did not


def test_grouped_dp_sharded_matches_single_device():
    """Under a dp mesh the grouped op runs shard-locally via shard_map;
    forward and gradients equal the single-device computation."""
    x, gv, gi, weights = _toy(g=8)
    key = jax.random.PRNGKey(0)

    def loss(x, gv, w):
        out = grouped_moe_mlp(x, gv, gi_dev, *w, key)
        return jnp.sum(out ** 2)

    gi_dev = gi
    ref_l, ref_g = jax.value_and_grad(loss, argnums=(0, 2))(x, gv, weights)

    mesh = make_mesh(MeshConfig(data=4, model=1))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    gvs = jax.device_put(gv, NamedSharding(mesh, P("data")))
    gi_dev = jax.device_put(gi, NamedSharding(mesh, P("data")))
    with jax.set_mesh(mesh):
        out_l, out_g = jax.jit(jax.value_and_grad(loss, argnums=(0, 2)))(
            xs, gvs, weights)
    np.testing.assert_allclose(float(out_l), float(ref_l), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(out_g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _make_trainer(tmp_path, mesh_cfg, *, impl="grouped", remat=False,
                  accum=1, drop=0.0):
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.training import Trainer

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 4, "num_heads": 4,
                  "num_classes": 14, "drop_rate": drop, "remat": remat,
                  "moe": {"enabled": True, "num_experts": 4, "k": 2,
                          "capacity_factor": 1.5, "every": 2,
                          "impl": impl}},
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


def test_grouped_trainer_dp_matches_single_device(tmp_path):
    """A dp8 Trainer step with the grouped engine (under remat + dropout)
    reproduces the single-device update exactly."""
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset

    images, labels = next(iter(DataLoader(
        SyntheticChestXrayDataset(size=16, image_size=16, seed=0), 16,
        num_workers=0,
    )))
    results = {}
    for name, mesh_cfg in [("dp1", {"data": 1, "model": 1}),
                           ("dp8", {"data": 8, "model": 1})]:
        tr = _make_trainer(tmp_path / name, mesh_cfg, remat=True)
        batch = shard_batch(tr.mesh, (images, labels))
        state, metrics, _ = tr._train_step(tr.state, tr.base_rng, *batch)
        state, metrics, _ = tr._train_step(state, tr.base_rng, *batch)
        results[name] = (state, float(metrics["loss"]))
    (s1, l1), (s8, l8) = results["dp1"], results["dp8"]
    np.testing.assert_allclose(l8, l1, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s8.params["model"]["blocks_1"]["moe"]["fc1_kernel"]),
        np.asarray(s1.params["model"]["blocks_1"]["moe"]["fc1_kernel"]),
        atol=5e-5)


def test_grouped_trainer_step_with_dropout_learns(tmp_path):
    """Dropout engages the per-shard PRNG folding inside shard_map; the
    step stays finite and the router moves."""
    tr = _make_trainer(tmp_path, {"data": 8, "model": 1}, drop=0.1,
                       accum=2)
    images, labels = next(iter(tr.train_loader))
    batch = shard_batch(tr.mesh, (images, labels))
    before = np.asarray(tr.state.params["model"]["blocks_1"]["moe"]["router"])
    state, metrics, _ = tr._train_step(tr.state, tr.base_rng, *batch)
    state, metrics, _ = tr._train_step(state, tr.base_rng, *batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["moe_aux"]) > 0.0
    after = np.asarray(state.params["model"]["blocks_1"]["moe"]["router"])
    assert np.abs(after - before).max() > 0.0


def test_group_local_experts_invariants():
    """The EP shard's local grouping: kept rows pack back-to-back per local
    expert, per-expert capacity clamps without cascading onto later
    experts, and the src scatter round-trips kept pairs."""
    from gavit_tpu.ops.moe_grouped import group_local_experts

    rng = np.random.RandomState(0)
    gi = jnp.array(rng.randint(0, 8, (3, 11, 2)), jnp.int32)
    first, e_loc, cpe = 2, 4, 5           # local experts [2, 6), cap 5 each
    dest, src, kept = group_local_experts(gi, first, e_loc, cpe)
    dest, src, kept = map(np.asarray, (dest, src, kept))
    flat = np.asarray(gi).reshape(-1)
    cap = e_loc * cpe
    # per-expert kept = min(realized, cap) — independent of other experts
    realized = np.bincount(flat, minlength=8)[first:first + e_loc]
    np.testing.assert_array_equal(kept, np.minimum(realized, cpe))
    offsets = np.cumsum(kept) - kept
    kept_pairs = dest < cap
    # every kept pair is local; dest values are unique and expert-packed
    assert (flat[kept_pairs] >= first).all()
    assert (flat[kept_pairs] < first + e_loc).all()
    assert len(set(dest[kept_pairs])) == kept_pairs.sum() == kept.sum()
    for e in range(e_loc):
        rows = dest[kept_pairs & (flat == first + e)]
        assert set(rows) == set(range(offsets[e], offsets[e] + kept[e]))
    # src inverts dest on the kept region
    np.testing.assert_array_equal(
        src[dest[kept_pairs]], np.flatnonzero(kept_pairs))
    # non-local pairs are parked at cap
    assert (dest[~kept_pairs] == cap).all()


def test_grouped_ep_matches_single_device():
    """dp2×ep4: the expert-parallel grouped engine (local-expert grouping,
    capacity-bounded buffer, psum combine — no all-to-all) reproduces the
    unsharded grouped forward AND gradients exactly when nothing drops."""
    from gavit_tpu.ops.moe_grouped import sharded_grouped_moe

    x, gv, gi, weights = _toy(g=8)
    key = jax.random.PRNGKey(0)

    def loss(x, gv, w):
        out = sharded_grouped_moe(x, gv, gi_dev, *w, key,
                                  ep_capacity_factor=4.0)
        return jnp.sum(out ** 2)

    gi_dev = gi
    ref_l, ref_g = jax.value_and_grad(loss, argnums=(0, 2))(x, gv, weights)

    mesh = make_mesh(MeshConfig(data=2, model=4))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    gvs = jax.device_put(gv, NamedSharding(mesh, P("data")))
    gi_dev = jax.device_put(gi, NamedSharding(mesh, P("data")))
    ws = tuple(jax.device_put(w, NamedSharding(mesh, P("model")))
               for w in weights)
    with jax.set_mesh(mesh):
        out_l, out_g = jax.jit(jax.value_and_grad(loss, argnums=(0, 2)))(
            xs, gvs, ws)
    np.testing.assert_allclose(float(out_l), float(ref_l), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(out_g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_resolve_moe_impl_encodes_measured_crossover():
    """'auto' = the BASELINE.md r4 probe as code: grouped at b128-class
    per-device routed pairs (128·197·2 = 50432), dense at b64-class
    (25216); explicit values pass through untouched."""
    from gavit_tpu.models.moe import resolve_moe_impl

    assert resolve_moe_impl("auto", 128 * 197 * 2) == "grouped"
    assert resolve_moe_impl("auto", 64 * 197 * 2) == "dense"
    assert resolve_moe_impl("dense", 10 ** 9) == "dense"
    assert resolve_moe_impl("grouped", 1) == "grouped"
    with pytest.raises(ValueError, match="unknown"):
        resolve_moe_impl("fast", 1)


def test_moe_auto_matches_resolved_engine(monkeypatch):
    """MoEMlp under impl='auto' computes exactly what the resolved engine
    computes — both below the threshold (dense) and, with the probe
    override dropping the threshold to 1, above it (grouped)."""
    cfg_auto = MoEConfig(enabled=True, num_experts=4, k=2, impl="auto",
                         capacity_factor=4.0)
    x = jax.random.normal(jax.random.key(1), (2, 9, 16))

    def run(cfg):
        mod = MoEMlp(cfg=cfg, hidden_dim=32, out_dim=16, drop=0.0)
        variables = mod.init(jax.random.key(2), x)
        return np.asarray(mod.apply(variables, x, deterministic=True))

    out_dense = run(dataclasses.replace(cfg_auto, impl="dense"))
    out_grouped = run(dataclasses.replace(cfg_auto, impl="grouped"))
    # tiny shape (36 pairs) -> dense
    np.testing.assert_allclose(run(cfg_auto), out_dense, atol=1e-6)
    # forced-low threshold -> grouped
    monkeypatch.setenv("GAVIT_MOE_AUTO_PAIRS", "1")
    np.testing.assert_allclose(run(cfg_auto), out_grouped, atol=1e-6)
    # the two engines agree here anyway (cf=4 -> no drops); the point is
    # each auto run matched its resolved engine bit-for-bit at atol 1e-6
    np.testing.assert_allclose(out_dense, out_grouped, atol=1e-5)


def test_grouped_ep_ragged_batch_falls_back_to_replicated():
    """A batch not divisible by the 'data' axis under dp×ep replicates the
    batch (experts stay sharded) instead of raising — the same graceful
    degradation as the dp-only path (r4 advisor finding)."""
    from gavit_tpu.ops.moe_grouped import sharded_grouped_moe

    x, gv, gi, weights = _toy(g=7)          # 7 % dp(2) != 0
    key = jax.random.PRNGKey(0)
    ref = sharded_grouped_moe(x, gv, gi, *weights, key,
                              ep_capacity_factor=4.0)

    mesh = make_mesh(MeshConfig(data=2, model=4))
    ws = tuple(jax.device_put(w, NamedSharding(mesh, P("model")))
               for w in weights)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda *a: sharded_grouped_moe(
            *a, ep_capacity_factor=4.0))(x, gv, gi, *ws, key)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_grouped_ep_capacity_drops_are_per_expert():
    """Past the ep_capacity_factor bound an overloaded expert drops its
    over-capacity pairs (per-expert — not cascading); the computed output
    equals the dense reference with those pairs' gates zeroed."""
    from gavit_tpu.ops.moe_grouped import grouped_moe_mlp_ep

    x, gv, _, weights = _toy(g=2, s=8, e=4)
    # expert 0 is hot (all 16 first choices); second choices spread over
    # experts 1-3 (5-6 pairs each, comfortably under the bound)
    second = (np.arange(16).reshape(2, 8) % 3 + 1).astype(np.int32)
    gi = jnp.stack([jnp.zeros((2, 8), jnp.int32), jnp.asarray(second)],
                   axis=-1)
    cpe = 10                                 # expert 0 keeps 10, drops 6
    out = grouped_moe_mlp_ep(x, gv, gi, *weights, jax.random.PRNGKey(0),
                             first=0, cap_per_expert=cpe)
    # reference: gates of the dropped pairs (within-expert rank >= cpe,
    # token-major order) zeroed — the cold experts keep ALL their pairs
    rank0 = np.arange(16).reshape(2, 8)      # expert 0 pair ranks
    gv_ref = np.asarray(gv).copy()
    gv_ref[..., 0] = np.where(rank0 < cpe, gv_ref[..., 0], 0.0)
    ref = _dense_equiv(x, jnp.asarray(gv_ref), gi, weights, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_grouped_trainer_ep_matches_single_device(tmp_path):
    """A dp2×ep4 Trainer step with the grouped engine reproduces the
    single-device update (the r3 guard is gone — VERDICT #5)."""
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset

    images, labels = next(iter(DataLoader(
        SyntheticChestXrayDataset(size=16, image_size=16, seed=0), 16,
        num_workers=0,
    )))
    results = {}
    for name, mesh_cfg in [("dp1", {"data": 1, "model": 1}),
                           ("dp2ep4", {"data": 2, "model": 4})]:
        tr = _make_trainer(tmp_path / name, mesh_cfg, remat=True)
        batch = shard_batch(tr.mesh, (images, labels))
        state, metrics, _ = tr._train_step(tr.state, tr.base_rng, *batch)
        state, metrics, _ = tr._train_step(state, tr.base_rng, *batch)
        results[name] = (state, float(metrics["loss"]))
    (s1, l1), (s8, l8) = results["dp1"], results["dp2ep4"]
    np.testing.assert_allclose(l8, l1, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s8.params["model"]["blocks_1"]["moe"]["fc1_kernel"]),
        np.asarray(s1.params["model"]["blocks_1"]["moe"]["fc1_kernel"]),
        atol=5e-5)


def test_grouped_ep_indivisible_expert_count_fails_loudly(tmp_path):
    """num_experts must divide by the 'model' axis — caught at Trainer
    build, not as an opaque GSPMD error."""
    with pytest.raises(ValueError, match="divisible"):
        _make_trainer(tmp_path, {"data": 1, "model": 8})  # 4 experts / 8


def test_upcycled_grouped_equals_dense_forward():
    """Sparse upcycling under the grouped engine: dropless + zero router
    means the upcycled forward IS the dense forward, with no capacity
    condition at all."""
    from gavit_tpu.models.moe import upcycle_params
    from gavit_tpu.models.vit import build_model, init_params

    moe_cfg = from_dict({"model": {
        "name": "custom", "img_size": 16, "patch_size": 8, "embed_dim": 32,
        "depth": 4, "num_heads": 4, "num_classes": 14,
        "moe": {"enabled": True, "num_experts": 4, "k": 2,
                "capacity_factor": 0.5, "every": 2, "impl": "grouped"},
    }})
    dense_cfg = dataclasses.replace(
        moe_cfg.model, moe=MoEConfig(enabled=False))
    dense_model = build_model(dense_cfg, precision="fp32")
    dense_params = init_params(dense_model, jax.random.key(0))
    moe_model = build_model(moe_cfg.model, precision="fp32")
    up = upcycle_params(
        dense_params, init_params(moe_model, jax.random.key(1)),
        moe_cfg.model)
    x = jax.random.normal(jax.random.key(2), (4, 16, 16, 3))
    np.testing.assert_allclose(
        np.asarray(moe_model.apply({"params": up}, x, deterministic=True)),
        np.asarray(dense_model.apply({"params": dense_params}, x,
                                     deterministic=True)),
        atol=1e-5)


def test_grouped_remat_matches_stored_residuals(tmp_path):
    """moe.grouped_remat wraps the grouped op in jax.checkpoint; the
    backward's recompute (incl. regenerated dropout masks from the same
    key) must reproduce the stored-residual path's update exactly."""
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.training import Trainer

    images, labels = next(iter(DataLoader(
        SyntheticChestXrayDataset(size=16, image_size=16, seed=0), 16,
        num_workers=0,
    )))
    results = {}
    for name, remat in [("stored", False), ("remat", True)]:
        cfg = from_dict({
            "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                      "embed_dim": 32, "depth": 4, "num_heads": 4,
                      "num_classes": 14, "drop_rate": 0.1,
                      "moe": {"enabled": True, "num_experts": 4, "k": 2,
                              "every": 2, "impl": "grouped",
                              "grouped_remat": remat}},
            "data": {"batch_size": 16, "image_size": 16},
            "training": {"epochs": 1, "warmup_epochs": 1,
                         "precision": "fp32"},
            "mesh": {"data": 2, "model": 1},
            "paths": {"save_dir": str(tmp_path / name / "ckpt"),
                      "log_dir": str(tmp_path / name / "logs")},
        })
        model = build_model(cfg.model, precision="fp32")
        params = init_params(model, jax.random.key(0))
        ds = SyntheticChestXrayDataset(size=16, image_size=16, seed=0)
        loader = DataLoader(ds, 16, num_workers=0)
        tr = Trainer(model, params, loader, loader, cfg)
        batch = shard_batch(tr.mesh, (images, labels))
        state, metrics, _ = tr._train_step(tr.state, tr.base_rng, *batch)
        state, metrics, _ = tr._train_step(state, tr.base_rng, *batch)
        results[name] = (state, float(metrics["loss"]))
    (s0, l0), (s1, l1) = results["stored"], results["remat"]
    np.testing.assert_allclose(l1, l0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s1.params["model"]["blocks_1"]["moe"]["fc1_kernel"]),
        np.asarray(s0.params["model"]["blocks_1"]["moe"]["fc1_kernel"]),
        atol=1e-6)


def test_grouped_ep_composes_with_checkpoint():
    """grouped_remat wraps sharded_grouped_moe in jax.checkpoint; under a
    dp×ep mesh that is remat-of-shard_map — gradients must still equal the
    unsharded, un-checkpointed computation."""
    from gavit_tpu.ops.moe_grouped import sharded_grouped_moe

    x, gv, gi, weights = _toy(g=8)
    key = jax.random.PRNGKey(0)

    def loss_plain(x, gv, w):
        out = sharded_grouped_moe(x, gv, gi_dev, *w, key,
                                  ep_capacity_factor=4.0)
        return jnp.sum(out ** 2)

    gi_dev = gi
    ref_l, ref_g = jax.value_and_grad(loss_plain, argnums=(0, 2))(
        x, gv, weights)

    def loss_ckpt(x, gv, w):
        fn = jax.checkpoint(
            lambda *a: sharded_grouped_moe(*a, ep_capacity_factor=4.0))
        return jnp.sum(fn(x, gv, gi_dev, *w, key) ** 2)

    mesh = make_mesh(MeshConfig(data=2, model=4))
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    gvs = jax.device_put(gv, NamedSharding(mesh, P("data")))
    gi_dev = jax.device_put(gi, NamedSharding(mesh, P("data")))
    ws = tuple(jax.device_put(w, NamedSharding(mesh, P("model")))
               for w in weights)
    with jax.set_mesh(mesh):
        out_l, out_g = jax.jit(jax.value_and_grad(
            loss_ckpt, argnums=(0, 2)))(xs, gvs, ws)
    np.testing.assert_allclose(float(out_l), float(ref_l), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(out_g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
