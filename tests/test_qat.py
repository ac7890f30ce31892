"""Quantisation-aware training (QAT): the fake-quant ops, the train/serve
consistency contract, and the Trainer/Predictor integration.

QAT (``training.qat: true``) fake-quantises every GEMM the int8 serving
path quantises — activations against static calibrated scales, the live
weights per column — with straight-through gradients, so the exported
checkpoint serves int8 under exactly the noise it trained through
(``gavit_tpu/ops/quant.py``, ``models/layers.py::_int8_forward``,
``serving.py::calibrate_act_scales/export_quant``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gavit_tpu.config import from_dict
from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
from gavit_tpu.models.vit import build_model, init_params
from gavit_tpu.ops.quant import (
    fake_quant_act,
    fake_quant_weight,
    quantize_rowwise,
)
from gavit_tpu.serving import calibrate_act_scales, export_quant
from gavit_tpu.training import Trainer


# ---------------------------------------------------------------------------
# ops
# ---------------------------------------------------------------------------


def test_fake_quant_act_matches_static_int8_reconstruction():
    x = jnp.asarray([[0.51, -3.0, 0.004, 200.0]], jnp.float32)
    s = 0.1
    got = fake_quant_act(x, s)
    want = jnp.clip(jnp.round(x / s), -127, 127) * s
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-7)


def test_fake_quant_act_ste_clips_gradient():
    s = 0.1  # representable range [-12.7, 12.7]
    x = jnp.asarray([1.0, -5.0, 20.0, -13.0], jnp.float32)
    g = jax.grad(lambda x: jnp.sum(fake_quant_act(x, s) * 2.0))(x)
    np.testing.assert_allclose(np.asarray(g), [2.0, 2.0, 0.0, 0.0])


def test_fake_quant_weight_matches_rowwise_quant_and_identity_grad():
    w = jax.random.normal(jax.random.key(0), (8, 4), jnp.float32)
    got = fake_quant_weight(w)
    q, scale = quantize_rowwise(w, axis=0)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(q.astype(jnp.float32) * scale),
        atol=1e-7)
    g = jax.grad(lambda w: jnp.sum(fake_quant_weight(w) * 3.0))(w)
    np.testing.assert_allclose(np.asarray(g), np.full((8, 4), 3.0))


# ---------------------------------------------------------------------------
# train/serve consistency contract
# ---------------------------------------------------------------------------


def _model_cfg(drop=0.0):
    return from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 2, "num_heads": 2,
                  "num_classes": 14, "drop_rate": drop,
                  "graph": {"enabled": True, "num_blocks": 1,
                            "adjacency": "knn", "k": 2}},
    }).model


def test_qat_forward_equals_int8_serving_forward():
    """The contract QAT exists for: the deterministic QAT forward (fake
    quant, fp dots) reconstructs the SAME values the int8 serving path
    computes from the exported collection (int8 dots + dequant), up to
    accumulation order."""
    cfg = _model_cfg()
    qat_model = build_model(cfg, precision="fp32", qat=True)
    params = init_params(qat_model, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3), jnp.float32)

    scales = calibrate_act_scales(qat_model, params, x)
    qat_out = qat_model.apply(
        {"params": params, **scales}, x, deterministic=True)

    int8_model = qat_model.clone(quant="int8")  # same fp32 compute dtype
    quant = export_quant(params, scales)
    int8_out = int8_model.apply(
        {"params": params, **quant}, x, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(qat_out), np.asarray(int8_out), atol=2e-4,
        err_msg="QAT noise model diverged from the int8 serving path")


def test_qat_without_scales_is_unquantised_calibration_pass():
    cfg = _model_cfg()
    qat_model = build_model(cfg, precision="fp32", qat=True)
    plain = build_model(cfg, precision="fp32")
    params = init_params(plain, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3), jnp.float32)
    out_q, _ = qat_model.apply(
        {"params": params}, x, deterministic=True,
        mutable=["quant_stats"])
    out_p = plain.apply({"params": params}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_p),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# trainer integration
# ---------------------------------------------------------------------------


def _setup(tmp_path, epochs=1):
    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 2, "num_heads": 2,
                  "num_classes": 14, "drop_rate": 0.1,
                  "graph": {"enabled": True, "num_blocks": 1,
                            "adjacency": "knn", "k": 2}},
        "data": {"batch_size": 16, "image_size": 16},
        "training": {"epochs": epochs, "warmup_epochs": 1, "qat": True,
                     "precision": "fp32", "log_every": 100},
        "paths": {"save_dir": str(tmp_path / "ckpt"),
                  "log_dir": str(tmp_path / "logs")},
    })
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    tr = SyntheticChestXrayDataset(size=32, image_size=16, seed=0)
    va = SyntheticChestXrayDataset(size=16, image_size=16, seed=1)
    tl = DataLoader(tr, 16, shuffle=True, num_workers=1)
    vl = DataLoader(va, 16, num_workers=1)
    return cfg, Trainer(model, params, tl, vl, cfg)


def test_qat_trainer_trains_and_checkpoints_scales(tmp_path):
    cfg, trainer = _setup(tmp_path)
    assert trainer.model.quant == "qat"
    assert trainer._quant and "quant" in trainer._quant
    result = trainer.train()
    assert np.isfinite(result["final_train_loss"])

    # resume adopts the checkpointed scales (not a fresh calibration)
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(7))
    tr = SyntheticChestXrayDataset(size=32, image_size=16, seed=0)
    tl = DataLoader(tr, 16, shuffle=True, num_workers=1)
    t2 = Trainer(model, params, tl, tl, cfg)
    import glob
    import os

    ckpts = sorted(glob.glob(str(tmp_path / "ckpt" / "checkpoint_epoch_*")))
    assert ckpts
    t2.restore_checkpoint(ckpts[-1])
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        t2._quant, trainer._quant,
    )
    assert os.path.isdir(str(tmp_path / "ckpt" / "best_model"))


def test_qat_checkpoint_serves_int8_with_trained_scales(tmp_path):
    cfg, trainer = _setup(tmp_path)
    trainer.train()
    ckpt_dir = str(tmp_path / "ckpt" / "best_model")

    from gavit_tpu.serving import Predictor
    from gavit_tpu.utils import checkpoint as ckpt_lib

    ckpt_lib.wait_for_saves()
    pred = Predictor(cfg, ckpt_dir, precision="int8", buckets=(4,))
    assert "quant" in pred._variables, "QAT scales were not picked up"
    img = np.zeros((2, 16, 16, 3), np.uint8)
    probs = pred.predict_proba(img)
    assert probs.shape == (2, 14)
    assert np.isfinite(probs).all()

    # calibrate() must NOT silently replace the trained noise model with
    # fresh sample scales (that reopens the train/serve skew QAT closes)
    before = jax.tree.leaves(pred._variables["quant"])
    rng = np.random.default_rng(0)
    pred.calibrate(rng.integers(0, 256, (4, 16, 16, 3), np.uint8))
    after = jax.tree.leaves(pred._variables["quant"])
    for a, b in zip(before, after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the explicit escape hatch does recalibrate
    pred.calibrate(rng.integers(0, 256, (4, 16, 16, 3), np.uint8),
                   force=True)
    forced = jax.tree.leaves(pred._variables["quant"])
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(before, forced)
    )


# ---------------------------------------------------------------------------
# sharding compositions
# ---------------------------------------------------------------------------


def test_qat_forward_matches_single_device_under_tp():
    """QAT's fake-quant GEMMs are plain dots — GSPMD-visible — so a dp×tp
    mesh must reproduce the single-device QAT forward exactly (Megatron
    column/row sharding around the fake-quant sites)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gavit_tpu.config import MeshConfig
    from gavit_tpu.parallel.mesh import make_mesh
    from gavit_tpu.parallel.tp import shard_model_params

    cfg = _model_cfg()
    qat_model = build_model(cfg, precision="fp32", qat=True,
                            attn_impl="xla", mlp_impl="xla")
    params = init_params(qat_model, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (8, 16, 16, 3), jnp.float32)
    scales = calibrate_act_scales(qat_model, params, x)
    ref = np.asarray(qat_model.apply(
        {"params": params, **scales}, x, deterministic=True))

    mesh = make_mesh(MeshConfig(data=2, model=4))
    tp_params = shard_model_params(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def fwd(p, x):
        return qat_model.apply({"params": p, **scales}, x,
                               deterministic=True)

    with jax.set_mesh(mesh):
        out = np.asarray(fwd(tp_params, xs))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_ring_attention_handles_fully_masked_shard():
    """n_valid smaller than one shard's worth: a whole K/V block is
    masked; the finite −1e30 accumulator init must keep the math exact
    and NaN-free (parallel/ring.py)."""
    from gavit_tpu.ops.attention import attention_reference
    from gavit_tpu.parallel.ring import make_ctx_mesh, ring_attention_local
    import functools
    from jax.sharding import PartitionSpec as P

    b, h, n, d, n_valid = 2, 2, 16, 8, 5  # shards 3..7 fully padded (nl=2)
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, n, d), jnp.float32) for kk in ks)
    mesh = make_ctx_mesh(8)
    spec = P(None, None, "ctx", None)
    out = jax.jit(jax.shard_map(
        functools.partial(ring_attention_local, scale=0.25,
                          axis_name="ctx", n_valid=n_valid),
        mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
        check_vma=False,
    ))(q, k, v)
    ref = attention_reference(
        q[:, :, :n_valid], k[:, :, :n_valid], v[:, :, :n_valid], 0.25)
    np.testing.assert_allclose(
        np.asarray(out)[:, :, :n_valid], np.asarray(ref), atol=1e-6)
    assert np.isfinite(np.asarray(out)).all(), "pad rows went non-finite"
