"""Trainer end-to-end: smoke training, metric surfaces, checkpoint full
resume (fixing the reference's weights-only resume — SURVEY §0.5)."""

import jax
import numpy as np
import pytest

from gavit_tpu.config import from_dict
from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
from gavit_tpu.models.vit import build_model, init_params
from gavit_tpu.training import Trainer
from gavit_tpu.utils import checkpoint as ckpt_lib


def _setup(tmp_path, epochs=2, graph=True):
    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 2, "num_heads": 2,
                  "num_classes": 14, "drop_rate": 0.1,
                  "graph": {"enabled": graph, "num_blocks": 1,
                            "adjacency": "knn", "k": 2}},
        "data": {"batch_size": 16, "image_size": 16},
        "training": {"epochs": epochs, "warmup_epochs": 1,
                     "early_stopping_patience": 10, "log_every": 100,
                     "precision": "fp32"},
        "paths": {"save_dir": str(tmp_path / "ckpt"),
                  "log_dir": str(tmp_path / "logs")},
    })
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    tr = SyntheticChestXrayDataset(size=48, image_size=16, seed=0)
    va = SyntheticChestXrayDataset(size=32, image_size=16, seed=1)
    tl = DataLoader(tr, 16, shuffle=True, num_workers=1)
    vl = DataLoader(va, 16, num_workers=1)
    return cfg, Trainer(model, params, tl, vl, cfg)


def test_train_returns_reference_metric_surface(tmp_path):
    _, trainer = _setup(tmp_path)
    result = trainer.train()
    for key in ("best_val_auc", "final_train_loss", "final_train_auc",
                "final_val_loss", "final_val_auc"):
        assert key in result and np.isfinite(result[key])
    assert len(trainer.train_metrics_history) == 2
    # per-disease + loss-component keys present (trainer.py:148-158 parity)
    m = trainer.train_metrics_history[0]
    for comp in ("loss_total", "loss_wbce", "loss_focal", "loss_asl"):
        assert comp in m
    assert "Atelectasis_auc" in m
    assert "images_per_sec" in m


def test_step_counter_advances(tmp_path):
    _, trainer = _setup(tmp_path, epochs=1)
    trainer.train()
    assert int(trainer.state.step) == 3  # 48/16 batches x 1 epoch


def test_checkpoint_full_resume(tmp_path):
    cfg, trainer = _setup(tmp_path, epochs=1)
    trainer.train()
    step_before = int(trainer.state.step)
    best_before = trainer.best_val_auc
    latest = ckpt_lib.latest_checkpoint(cfg.paths.save_dir)
    assert latest is not None

    # fresh trainer (new params) restores everything
    cfg2, trainer2 = _setup(tmp_path, epochs=1)
    trainer2.restore_checkpoint(latest)
    assert int(trainer2.state.step) == step_before
    assert trainer2.current_epoch == 1  # resumes AFTER the saved epoch
    assert abs(trainer2.best_val_auc - best_before) < 1e-9
    np.testing.assert_allclose(
        np.asarray(trainer2.state.params["model"]["head"]["kernel"]),
        np.asarray(trainer.state.params["model"]["head"]["kernel"]),
    )
    # optimizer moments restored too (not just weights)
    def first_mu(state):
        inner = state.opt_state.inner_states["model"].inner_state
        return jax.tree.leaves(inner)[1]

    np.testing.assert_allclose(
        np.asarray(first_mu(trainer2.state))[:2],
        np.asarray(first_mu(trainer.state))[:2],
    )


def test_early_stopping_counter(tmp_path):
    cfg, trainer = _setup(tmp_path, epochs=1)
    trainer.best_val_auc = 2.0  # unbeatable → patience increments
    trainer.early_stop_patience = 1
    trainer.train()
    assert trainer.patience_counter >= 1


def test_best_model_saved(tmp_path):
    import os

    cfg, trainer = _setup(tmp_path, epochs=1)
    trainer.train()
    assert os.path.isdir(os.path.join(cfg.paths.save_dir, "best_model"))


def test_steps_per_call_equivalence(tmp_path):
    """K fused steps via lax.scan must produce bit-for-bit the same training
    trajectory as K separate dispatches (same rng folding by state.step)."""
    import dataclasses

    cfg1, t1 = _setup(tmp_path / "a", epochs=1)
    cfg2, t2 = _setup(tmp_path / "b", epochs=1)
    t2.config = dataclasses.replace(
        cfg2, training=dataclasses.replace(cfg2.training, steps_per_call=2)
    )
    t1.train_epoch()
    t2.train_epoch()
    assert int(t1.state.step) == int(t2.state.step)
    np.testing.assert_allclose(
        np.asarray(t1.state.params["model"]["head"]["kernel"]),
        np.asarray(t2.state.params["model"]["head"]["kernel"]),
        atol=1e-6,
    )


def test_eval_freq_and_save_freq(tmp_path):
    """eval_freq/save_freq are live here (the reference declares them in its
    YAML but never wires them — SURVEY §2.5)."""
    import dataclasses
    import os

    cfg, trainer = _setup(tmp_path, epochs=4)
    trainer.config = dataclasses.replace(
        cfg, training=dataclasses.replace(
            cfg.training, eval_freq=2, save_freq=1, epochs=4
        )
    )
    trainer.train()
    # validated on epochs 2 and 4 only
    assert len(trainer.val_metrics_history) == 2
    assert len(trainer.train_metrics_history) == 4
    # non-validated epochs saved periodic checkpoints
    names = os.listdir(cfg.paths.save_dir)
    assert sum(n.startswith("checkpoint_epoch_") for n in names) >= 2


def test_preemption_saves_resume_checkpoint(tmp_path):
    """A latched SIGTERM makes train() checkpoint and exit cleanly instead of
    finishing all epochs (TPU-VM preemption path)."""
    import os

    from gavit_tpu.utils.preemption import PreemptionHandler

    cfg, trainer = _setup(tmp_path, epochs=50)  # would run 50 epochs
    handler = PreemptionHandler()
    handler._flag.set()  # pre-armed: preempt at the first safe point
    trainer._preemption = handler
    result = trainer.train()  # returns, does not raise
    assert isinstance(result, dict)
    # it stopped early and saved a checkpoint
    names = os.listdir(cfg.paths.save_dir)
    assert any(n.startswith("checkpoint_epoch_") for n in names)
    assert len(trainer.train_metrics_history) < 50


def test_preemption_handler_signal():
    import os
    import signal

    from gavit_tpu.utils.preemption import PreemptionHandler

    h = PreemptionHandler(signals=(signal.SIGUSR1,)).install()
    assert not h.preempted
    os.kill(os.getpid(), signal.SIGUSR1)
    assert h.preempted
    h.uninstall()


def test_validate_deterministic(tmp_path):
    _, trainer = _setup(tmp_path, epochs=1)
    m1 = trainer.validate()
    m2 = trainer.validate()
    assert m1["loss"] == pytest.approx(m2["loss"], abs=1e-7)
    assert m1["mean_auc"] == pytest.approx(m2["mean_auc"], abs=1e-9)


def test_preemption_epoch0_resumes_at_epoch0(tmp_path):
    """Preemption before any completed epoch must replay epoch 0 on resume
    (a round-1 clamp made it skip to epoch 1 — ADVICE r1)."""
    from gavit_tpu.utils.preemption import PreemptionHandler

    cfg, trainer = _setup(tmp_path, epochs=5)
    handler = PreemptionHandler()
    handler._flag.set()  # preempt at the first safe point, inside epoch 0
    trainer._preemption = handler
    trainer.train()

    latest = ckpt_lib.latest_checkpoint(cfg.paths.save_dir)
    _, trainer2 = _setup(tmp_path, epochs=5)
    trainer2.restore_checkpoint(latest)
    assert trainer2.current_epoch == 0  # epoch 0 never completed


def test_restore_patience_and_best_epoch(tmp_path):
    """patience_counter/best_epoch survive resume so early stopping picks up
    exactly where it left off (ADVICE r1)."""
    cfg, trainer = _setup(tmp_path, epochs=1)
    trainer.train()
    trainer.patience_counter = 3
    trainer.best_epoch = 7
    trainer.save_checkpoint({"mean_auc": 0.5})
    path = str(
        tmp_path / "ckpt" / ckpt_lib.checkpoint_name(trainer.current_epoch, 0.5)
    )

    _, trainer2 = _setup(tmp_path, epochs=1)
    trainer2.restore_checkpoint(path)
    assert trainer2.patience_counter == 3
    assert trainer2.best_epoch == 7


def test_grad_accum_matches_full_batch(tmp_path):
    """grad_accum_steps=2 must produce the same optimizer update as the
    full-batch step (drop_rate=0 so micro-batch RNG streams don't enter)."""
    from gavit_tpu.parallel.mesh import shard_batch

    def make(accum):
        cfg = from_dict({
            "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                      "embed_dim": 32, "depth": 2, "num_heads": 2,
                      "num_classes": 14, "drop_rate": 0.0,
                      "graph": {"enabled": True, "num_blocks": 1,
                                "adjacency": "knn", "k": 2}},
            "data": {"batch_size": 16, "image_size": 16},
            "training": {"epochs": 1, "warmup_epochs": 1, "precision": "fp32",
                         "grad_accum_steps": accum},
            "paths": {"save_dir": str(tmp_path / "ckpt"),
                      "log_dir": str(tmp_path / "logs")},
        })
        model = build_model(cfg.model, precision="fp32")
        params = init_params(model, jax.random.key(0))
        ds = SyntheticChestXrayDataset(size=16, image_size=16, seed=0)
        loader = DataLoader(ds, 16, num_workers=0)
        return Trainer(model, params, loader, loader, cfg)

    images, labels = next(iter(DataLoader(
        SyntheticChestXrayDataset(size=16, image_size=16, seed=0), 16,
        num_workers=0,
    )))

    out = {}
    for accum in (1, 2, 4):
        tr = make(accum)
        batch = shard_batch(tr.mesh, (images, labels))
        state, metrics, preds = tr._train_step(tr.state, tr.base_rng, *batch)
        out[accum] = (state, float(metrics["loss"]), np.asarray(preds))

    s1, loss1, p1 = out[1]
    for accum in (2, 4):
        sa, lossa, pa = out[accum]
        np.testing.assert_allclose(lossa, loss1, atol=1e-6)
        np.testing.assert_allclose(pa, p1, atol=1e-5)
        a = jax.tree.leaves(sa.params["model"])
        b = jax.tree.leaves(s1.params["model"])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=5e-6)


def test_grad_accum_rejects_indivisible(tmp_path):
    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 1, "num_heads": 2,
                  "num_classes": 14, "drop_rate": 0.0,
                  "graph": {"enabled": False}},
        "data": {"batch_size": 6, "image_size": 16},
        "training": {"epochs": 1, "warmup_epochs": 1, "precision": "fp32",
                     "grad_accum_steps": 4},
        "paths": {"save_dir": str(tmp_path / "c"),
                  "log_dir": str(tmp_path / "l")},
    })
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    ds = SyntheticChestXrayDataset(size=6, image_size=16, seed=0)
    loader = DataLoader(ds, 6, num_workers=0)
    tr = Trainer(model, params, loader, loader, cfg)
    images, labels = next(iter(loader))
    with pytest.raises(ValueError, match="not divisible"):
        tr._train_step(tr.state, tr.base_rng,
                       jax.numpy.asarray(images), jax.numpy.asarray(labels))


def test_async_checkpoint_save_roundtrip(tmp_path):
    """save_async snapshots the state (safe against donation) and persists
    in the background; wait_for_saves guarantees durability; the `also`
    copies share the snapshot."""
    import jax.numpy as jnp

    tree = {"w": jnp.arange(8, dtype=jnp.float32), "step": jnp.int32(3)}
    main = str(tmp_path / "ck")
    extra = str(tmp_path / "best")
    ckpt_lib.save_async(main, tree, {"epoch": 1}, also=[extra])
    ckpt_lib.wait_for_saves()
    for path in (main, extra):
        state, meta = ckpt_lib.restore(path, tree)
        assert meta["epoch"] == 1
        np.testing.assert_array_equal(np.asarray(state["w"]),
                                      np.arange(8, dtype=np.float32))
        assert int(state["step"]) == 3
    # idempotent when nothing is pending
    ckpt_lib.wait_for_saves()
