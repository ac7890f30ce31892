"""Token-merging inference (models/tome.py): exactness at r=0, shape/size
bookkeeping of the bipartite merge, cls protection, graph compatibility,
and the accuracy dial on the learnable task.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gavit_tpu.config import from_dict
from gavit_tpu.models.tome import bipartite_merge, tome_forward, tome_forward_fn
from gavit_tpu.models.vit import build_model, init_params


def _cfg(graph=True, dynamic=True, img=32):
    return from_dict({
        "model": {"name": "custom", "img_size": img, "patch_size": 8,
                  "embed_dim": 32, "depth": 3, "num_heads": 2,
                  "num_classes": 14, "drop_rate": 0.0,
                  "graph": {"enabled": graph, "num_blocks": 1,
                            "adjacency": "knn", "k": 3,
                            "dynamic": dynamic}},
    }).model


def test_merge_shapes_sizes_and_cls_protection():
    x = jax.random.normal(jax.random.key(0), (2, 17, 8), jnp.float32)
    sizes = jnp.ones((2, 17, 1), jnp.float32)
    y, s = bipartite_merge(x, sizes, r=4)
    assert y.shape == (2, 13, 8)
    assert s.shape == (2, 13, 1)
    # total size is conserved; every size >= 1
    np.testing.assert_allclose(np.asarray(jnp.sum(s, axis=1)), 17.0,
                               rtol=1e-6)
    assert float(jnp.min(s)) >= 1.0
    # cls token rides through untouched
    np.testing.assert_array_equal(np.asarray(y[:, 0]), np.asarray(x[:, 0]))


def test_merge_merges_the_most_similar_pair():
    # token 1 (A-set) is a near-duplicate of token 2 (B-set): with r=1 the
    # merge must combine exactly those two, leaving the others intact
    base = jax.random.normal(jax.random.key(1), (1, 5, 4), jnp.float32)
    x = base.at[:, 1].set(base[:, 2] + 1e-4)
    sizes = jnp.ones((1, 5, 1), jnp.float32)
    y, s = bipartite_merge(x, sizes, r=1)
    assert y.shape == (1, 4, 4)
    merged = 0.5 * (x[:, 1] + x[:, 2])
    found = np.abs(np.asarray(y) - np.asarray(merged)[:, None]).max(-1).min()
    assert found < 1e-5, "expected the near-duplicate pair to merge"
    assert float(jnp.max(s)) == 2.0 and float(jnp.sum(s)) == 5.0


def test_r0_matches_sequential_model():
    cfg = _cfg()
    model = build_model(cfg, precision="fp32")
    params = init_params(model, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3), jnp.float32)
    ref = model.apply({"params": params}, x, deterministic=True)
    out = tome_forward(cfg, params, x, r=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_r_positive_runs_and_changes_little_at_small_r():
    cfg = _cfg()
    model = build_model(cfg, precision="fp32")
    params = init_params(model, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3), jnp.float32)
    ref = np.asarray(model.apply({"params": params}, x, deterministic=True))
    out = np.asarray(jax.jit(tome_forward_fn(cfg, r=2))(params, x))
    assert np.isfinite(out).all()
    # merging 2 of 17 tokens per block perturbs logits, but boundedly
    assert np.abs(out - ref).max() < 1.0


def test_learned_static_graph_rejected():
    cfg = _cfg(dynamic=False)
    model = build_model(cfg, precision="fp32")
    params = init_params(model, jax.random.key(0))
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    with pytest.raises(ValueError, match="dynamic"):
        tome_forward(cfg, params, x, r=2)


def test_learnable_task_auc_survives_merging():
    """The accuracy dial: a model trained WITHOUT merging keeps most of its
    AUC when served with moderate r (training-free acceleration)."""
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.ops.preprocess import val_preprocess
    from gavit_tpu.training import Trainer
    from gavit_tpu.utils.metrics import MetricCalculator
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        cfg = from_dict({
            "model": {"name": "custom", "img_size": 32, "patch_size": 8,
                      "embed_dim": 64, "depth": 2, "num_heads": 2,
                      "num_classes": 14, "drop_rate": 0.1,
                      "graph": {"enabled": True, "num_blocks": 1,
                                "adjacency": "knn", "k": 4,
                                "dynamic": True}},
            "data": {"batch_size": 32, "image_size": 32},
            "training": {"epochs": 4, "warmup_epochs": 1,
                         "precision": "fp32", "learning_rate": 3e-4,
                         "log_every": 100},
            "paths": {"save_dir": td + "/ckpt", "log_dir": td + "/logs"},
        })
        tr = SyntheticChestXrayDataset(size=192, image_size=32, seed=0,
                                       learnable=True)
        va = SyntheticChestXrayDataset(size=96, image_size=32, seed=1,
                                       learnable=True)
        model = build_model(cfg.model, precision="fp32")
        params = init_params(model, jax.random.key(0))
        trainer = Trainer(model, params,
                          DataLoader(tr, 32, shuffle=True, num_workers=1),
                          DataLoader(va, 32, num_workers=1), cfg)
        trainer.train()
        p = jax.device_get(trainer.state.params["model"])

        imgs = np.stack([np.asarray(va[i][0]) for i in range(96)])
        labels = np.stack([np.asarray(va[i][1]) for i in range(96)])
        xv = val_preprocess(jnp.asarray(imgs, jnp.uint8))
        mc = MetricCalculator(va.disease_names)

        base = mc.calculate_metrics(labels, np.asarray(
            jax.nn.sigmoid(model.apply({"params": p}, xv,
                                       deterministic=True))))["mean_auc"]
        merged = mc.calculate_metrics(labels, np.asarray(
            jax.nn.sigmoid(tome_forward(cfg.model, p, xv, r=2))))["mean_auc"]
        # 2 merges/block on 17 tokens (≈24% fewer tokens by the last block)
        assert merged > base - 0.08, (base, merged)


def test_predictor_tome_dp_mesh_matches_single():
    """Token merging composes with meshed serving: the merge is pure
    batch-dim math (argsort/take_along_axis per image), so a dp mesh shards
    it like any other layer — probabilities identical to single-device."""
    from gavit_tpu.config import MeshConfig
    from gavit_tpu.parallel.mesh import make_mesh
    from gavit_tpu.serving import Predictor

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 32, "patch_size": 8,
                  "embed_dim": 32, "depth": 2, "num_heads": 2,
                  "num_classes": 14, "drop_rate": 0.0,
                  "graph": {"enabled": True, "num_blocks": 1,
                            "adjacency": "knn", "k": 3, "dynamic": True}},
        "data": {"image_size": 32},
    })
    single = Predictor(cfg, None, precision="fp32", buckets=(8,), tome_r=2)
    params = jax.device_get(single.params)
    mesh = make_mesh(MeshConfig(data=8, model=1))
    meshed = Predictor(cfg, None, precision="fp32", buckets=(8,),
                       params=params, mesh=mesh, tome_r=2)
    imgs = np.random.default_rng(0).integers(0, 255, (8, 32, 32, 3),
                                             np.uint8)
    np.testing.assert_allclose(
        meshed.predict_proba(imgs), single.predict_proba(imgs), atol=1e-6
    )


def test_predictor_tome_mode():
    from gavit_tpu.config import from_dict as cfg_from
    from gavit_tpu.serving import Predictor

    cfg = cfg_from({
        "model": {"name": "custom", "img_size": 32, "patch_size": 8,
                  "embed_dim": 32, "depth": 2, "num_heads": 2,
                  "num_classes": 14, "drop_rate": 0.0,
                  "graph": {"enabled": True, "num_blocks": 1,
                            "adjacency": "knn", "k": 3, "dynamic": True}},
        "data": {"batch_size": 8, "image_size": 32},
    })
    pred = Predictor(cfg, None, precision="fp32", buckets=(4,), tome_r=2)
    probs = pred.predict_proba(np.zeros((3, 32, 32, 3), np.uint8))
    assert probs.shape == (3, 14) and np.isfinite(probs).all()


def test_tome_int8_composition():
    """Static-int8 serving composes with token merging: the quant
    collection threads per block through the merged trunk. At r=0 the
    tome int8 path reproduces the int8 model.apply exactly (same static
    quant math); at r>0 it stays a bounded perturbation of fp32; before
    calibration it refuses loudly (no dynamic-PTQ pass in the merged
    trunk)."""
    from gavit_tpu.config import from_dict as cfg_from
    from gavit_tpu.serving import Predictor

    cfg = cfg_from({
        "model": {"name": "custom", "img_size": 32, "patch_size": 8,
                  "embed_dim": 32, "depth": 2, "num_heads": 2,
                  "num_classes": 14, "drop_rate": 0.0,
                  "graph": {"enabled": True, "num_blocks": 1,
                            "adjacency": "knn", "k": 3, "dynamic": True}},
        "data": {"image_size": 32},
    })
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (4, 32, 32, 3), np.uint8)

    uncal = Predictor(cfg, None, precision="int8", buckets=(4,), tome_r=2)
    with pytest.raises(RuntimeError, match="calibrate"):
        uncal.predict_proba(imgs)

    p_int8 = Predictor(cfg, None, precision="int8", buckets=(4,))
    p_int8.calibrate(imgs)
    ref_int8 = p_int8.predict_proba(imgs)

    params = jax.device_get(p_int8.params)
    t0 = Predictor(cfg, None, precision="int8", buckets=(4,),
                   params=params, tome_r=0)
    t0._variables = p_int8._variables  # same calibrated scales
    np.testing.assert_allclose(t0.predict_proba(imgs), ref_int8, atol=1e-6)

    t2 = Predictor(cfg, None, precision="int8", buckets=(4,),
                   params=params, tome_r=2)
    t2._variables = p_int8._variables
    out = t2.predict_proba(imgs)
    fp = Predictor(cfg, None, precision="fp32", buckets=(4,),
                   params=params, tome_r=2).predict_proba(imgs)
    assert np.isfinite(out).all()
    assert np.abs(out - fp).max() < 0.2  # quantisation noise, not garbage
