"""GraphBlock wiring variants: learned-static, shared static adjacency,
include_cls, dense/threshold in-model."""

import jax
import jax.numpy as jnp
import numpy as np

from gavit_tpu.config import from_dict
from gavit_tpu.models.vit import build_model, init_params


def _model(graph, depth=4):
    cfg = from_dict({"model": {
        "name": "custom", "img_size": 32, "patch_size": 8, "embed_dim": 48,
        "depth": depth, "num_heads": 2, "num_classes": 14, "drop_rate": 0.0,
        "graph": graph,
    }})
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    return cfg, model, params


def _run(model, params, seed=1):
    x = jax.random.normal(jax.random.key(seed), (2, 32, 32, 3))
    return model.apply({"params": params}, x, deterministic=True)


def test_learned_static_adjacency():
    cfg, model, params = _model({"enabled": True, "num_blocks": 1,
                                 "adjacency": "learned_static"})
    assert params["graph_0"]["adj_logits"].shape == (16, 16)
    logits = _run(model, params)
    assert logits.shape == (2, 14)
    # adjacency logits receive gradients once the gate is nonzero
    params["graph_0"]["gate"] = jnp.float32(0.5)

    def loss(p):
        x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
        return jnp.sum(model.apply({"params": p}, x) ** 2)

    g = jax.grad(loss)(params)
    assert np.abs(np.asarray(g["graph_0"]["adj_logits"])).max() > 0


def test_static_shared_adjacency_two_blocks():
    """dynamic=False with 2 graph blocks: adjacency built once at the first
    site and reused (the second block has no rebuild of its own)."""
    cfg, model, params = _model({"enabled": True, "num_blocks": 2,
                                 "adjacency": "knn", "k": 3,
                                 "dynamic": False})
    assert "graph_0" in params and "graph_1" in params
    logits = _run(model, params)
    assert np.isfinite(np.asarray(logits)).all()


def test_dynamic_two_blocks_differ_from_static():
    graph = {"enabled": True, "num_blocks": 2, "adjacency": "knn", "k": 3}
    _, m_dyn, p = _model(graph | {"dynamic": True})
    _, m_sta, _ = _model(graph | {"dynamic": False})
    # make gates nonzero so the graph branch actually contributes
    for params in (p,):
        params["graph_0"]["gate"] = jnp.float32(1.0)
        params["graph_1"]["gate"] = jnp.float32(1.0)
    out_dyn = _run(m_dyn, p)
    out_sta = _run(m_sta, p)
    assert not np.allclose(np.asarray(out_dyn), np.asarray(out_sta))


def test_include_cls():
    cfg, model, params = _model({"enabled": True, "num_blocks": 1,
                                 "adjacency": "dense", "include_cls": True})
    logits = _run(model, params)
    assert np.isfinite(np.asarray(logits)).all()


def test_threshold_in_model():
    cfg, model, params = _model({"enabled": True, "num_blocks": 1,
                                 "adjacency": "threshold", "threshold": 0.1,
                                 "temperature": 0.5})
    logits = _run(model, params)
    assert np.isfinite(np.asarray(logits)).all()


def test_graph_384_style_resolution():
    """Larger grid (learned_static at 12x12=144 patches) builds and runs."""
    cfg, model, params = _model({"enabled": True, "num_blocks": 1,
                                 "adjacency": "learned_static"})
    # re-init at a different resolution: learned adjacency follows N
    model96 = build_model(
        from_dict({"model": {
            "name": "custom", "img_size": 96, "patch_size": 8,
            "embed_dim": 48, "depth": 2, "num_heads": 2, "num_classes": 14,
            "graph": {"enabled": True, "num_blocks": 1,
                      "adjacency": "learned_static"},
        }}).model,
        precision="fp32",
    )
    p96 = init_params(model96, jax.random.key(0))
    assert p96["graph_0"]["adj_logits"].shape == (144, 144)
    x = jax.random.normal(jax.random.key(2), (1, 96, 96, 3))
    out = model96.apply({"params": p96}, x, deterministic=True)
    assert out.shape == (1, 14)
