"""Config loading: reference-YAML back-compat, coercion, presets, graph keys."""

import textwrap

import pytest

from gavit_tpu.config import Config, from_dict, load_config


def test_reference_yaml_schema_loads(tmp_path):
    """The reference's exact baseline_config.yaml schema
    (``configs/baseline_config.yaml:11-56``) must parse unchanged."""
    yaml_text = textwrap.dedent("""
        data:
          train_dir: "/data/train"
          val_dir: "/data/val"
          train_labels: "/labels/train_list.txt"
          val_labels: "/labels/val_list.txt"
          image_size: 224
          batch_size: 32
          num_workers: 4
        model:
          name: "vit_base_16"
          pretrained_path: "./vit-b_CXR_0.5M_mae.pth"
          img_size: 224
          patch_size: 16
          in_chans: 3
          num_classes: 14
          embed_dim: 768
          depth: 12
          num_heads: 12
          mlp_ratio: 4.0
          drop_rate: 0.1
        training:
          epochs: 150
          learning_rate: 0.0001
          weight_decay: 0.05
          warmup_epochs: 5
          eval_freq: 1
          save_freq: 5
          early_stopping_patience: 10
        optimizer:
          name: "adamw"
          beta1: 0.9
          beta2: 0.999
          eps: 1.0e-8
        paths:
          save_dir: "checkpoints"
          log_dir: "logs"
        wandb:
          project: "thoracic-disease-classification"
          name: "baseline-vit"
          entity: "someone"
    """)
    path = tmp_path / "ref.yaml"
    path.write_text(yaml_text)
    cfg = load_config(str(path))
    assert cfg.model.embed_dim == 768
    assert cfg.model.num_heads == 12
    assert cfg.training.epochs == 150
    assert cfg.training.learning_rate == 1e-4
    assert cfg.optimizer.eps == 1e-8
    assert cfg.data.batch_size == 32
    assert not cfg.model.graph.enabled  # graph defaults off for old YAML


def test_string_numbers_coerced():
    """The reference re-parses strings to float at use sites
    (``trainer.py:26-34``); here it happens once at load."""
    cfg = from_dict({
        "training": {"learning_rate": "1e-4", "epochs": "10"},
        "optimizer": {"eps": "1.0e-8"},
    })
    assert cfg.training.learning_rate == 1e-4
    assert cfg.training.epochs == 10
    assert cfg.optimizer.eps == 1e-8


def test_bad_value_raises():
    with pytest.raises(ValueError, match="learning_rate"):
        from_dict({"training": {"learning_rate": "fast"}})


def test_model_presets_apply_without_overriding_explicit():
    cfg = from_dict({"model": {"name": "vit_small_16"}})
    assert cfg.model.embed_dim == 384 and cfg.model.num_heads == 6
    cfg2 = from_dict({"model": {"name": "vit_small_16", "embed_dim": 512}})
    assert cfg2.model.embed_dim == 512  # explicit wins
    assert cfg2.model.num_heads == 6


def test_graph_insert_positions():
    cfg = from_dict({"model": {
        "depth": 12, "graph": {"enabled": True, "num_blocks": 1}}})
    assert cfg.model.graph_insert_after() == (5,)
    cfg2 = from_dict({"model": {
        "depth": 12, "graph": {"enabled": True, "num_blocks": 2}}})
    assert cfg2.model.graph_insert_after() == (3, 7)
    cfg3 = from_dict({"model": {
        "graph": {"enabled": True, "num_blocks": 1, "insert_after": [9]}}})
    assert cfg3.model.graph_insert_after() == (9,)
    assert from_dict({}).model.graph_insert_after() == ()


def test_unknown_keys_preserved_in_extra():
    cfg = from_dict({"data": {"batch_size": 8, "my_custom_key": 42}})
    assert cfg.data.extra["my_custom_key"] == 42


def test_roundtrip_to_dict():
    cfg = from_dict({"model": {"name": "vit_small_16",
                               "graph": {"enabled": True}}})
    d = cfg.to_dict()
    cfg2 = from_dict(d)
    assert cfg2.model.embed_dim == cfg.model.embed_dim
    assert cfg2.model.graph.enabled


def test_defaults_match_reference():
    cfg = Config()
    assert cfg.model.embed_dim == 768  # vit.py:125-127 defaults
    assert cfg.model.qkv_bias is True
    assert cfg.training.max_grad_norm == 1.0  # trainer.py:32
    assert cfg.training.criterion_lr_scale == 0.1  # trainer.py:50
    assert cfg.training.early_stopping_patience == 10


def test_load_config_overrides(tmp_path):
    """--set dotted-key overrides: YAML-parsed values, nested creation."""
    from gavit_tpu.config import load_config

    p = tmp_path / "c.yaml"
    p.write_text("model:\n  name: vit_small_16\ndata:\n  batch_size: 32\n")
    cfg = load_config(str(p), overrides=[
        "data.batch_size=64",
        "training.epochs=3",
        "mesh.data=2",
        "model.graph.enabled=true",
    ])
    assert cfg.data.batch_size == 64
    assert cfg.training.epochs == 3
    assert cfg.mesh.data == 2
    assert cfg.model.graph.enabled is True

    import pytest

    with pytest.raises(ValueError, match="key=value"):
        load_config(str(p), overrides=["data.batch_size"])
