"""The five shipped configs (= the five BASELINE.json configurations) must
load, validate, and describe constructible models."""

from pathlib import Path

import pytest

from gavit_tpu.config import load_config

CONFIG_DIR = Path(__file__).resolve().parent.parent / "configs"
CONFIGS = sorted(CONFIG_DIR.glob("*.yaml"))


def test_five_configs_ship():
    assert len(CONFIGS) == 5, [c.name for c in CONFIGS]


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: p.name)
def test_config_loads_and_is_consistent(path):
    cfg = load_config(str(path))
    m = cfg.model
    assert m.embed_dim % m.num_heads == 0
    assert m.img_size % m.patch_size == 0
    assert m.num_classes == 14
    assert cfg.training.epochs > 0 and cfg.training.learning_rate > 0
    assert m.graph.enabled  # every BASELINE config includes the graph branch
    sites = m.graph_insert_after()
    assert len(sites) == m.graph.num_blocks
    assert all(0 <= s < m.depth for s in sites)
    assert m.graph.adjacency in ("knn", "threshold", "dense", "learned_static")


def test_baseline_config_matches_driver_spec():
    """configs[0]: ViT-S/16 + 1 graph layer at 224px."""
    cfg = load_config(str(CONFIG_DIR / "baseline_config.yaml"))
    assert cfg.model.embed_dim == 384 and cfg.model.num_heads == 6
    assert cfg.model.graph.num_blocks == 1
    assert cfg.data.image_size == 224


def test_v5e8_config_matches_driver_spec():
    """configs[4]: global batch 1024 data-parallel over an 8-chip mesh."""
    cfg = load_config(str(CONFIG_DIR / "v5e8_dp.yaml"))
    assert cfg.data.batch_size == 1024
    assert cfg.mesh.data == 8
    assert cfg.model.embed_dim == 768


def test_dynamic_and_384_configs():
    dyn = load_config(str(CONFIG_DIR / "dynamic_knn.yaml"))
    assert dyn.model.graph.adjacency == "threshold" and dyn.model.graph.dynamic
    ft = load_config(str(CONFIG_DIR / "finetune_384.yaml"))
    assert ft.model.img_size == 384
    assert ft.model.graph.adjacency == "learned_static"
    assert ft.training.precision == "bf16"


def test_baseline_config_model_builds_and_runs():
    import jax
    import numpy as np

    from gavit_tpu.models.vit import build_model, init_params

    cfg = load_config(str(CONFIG_DIR / "baseline_config.yaml"))
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    x = jax.numpy.zeros((1, 224, 224, 3))
    logits = model.apply({"params": params}, x, deterministic=True)
    assert logits.shape == (1, 14)
    assert np.isfinite(np.asarray(logits)).all()
