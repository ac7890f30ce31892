"""Context-parallel ViT forward (parallel/cp.py): parity with the
sequential model.

The CP runner keeps each chip on n/S token rows through the whole trunk
(LayerNorm/MLP/residuals are token-local) and runs attention as the ring.
These tests pin (a) logits exactly equal to ``VisionTransformer.apply`` on
the same param tree — including a token count that does NOT divide the ctx
axis (pad + key-masking path), (b) parameter gradients through the
reverse ring, (c) the ctx×data mesh composition, and (d) validation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gavit_tpu.config import from_dict
from gavit_tpu.models.vit import build_model, init_params
from gavit_tpu.parallel.cp import ctx_forward, ctx_forward_fn, make_cp_mesh


def _setup(img=16, patch=8, depth=2, embed=32, heads=2):
    cfg = from_dict({
        "model": {"name": "custom", "img_size": img, "patch_size": patch,
                  "embed_dim": embed, "depth": depth, "num_heads": heads,
                  "num_classes": 14, "drop_rate": 0.0,
                  "graph": {"enabled": False}},
    }).model
    model = build_model(cfg, precision="fp32", attn_impl="xla",
                        mlp_impl="xla")
    params = init_params(model, jax.random.key(0))
    images = jax.random.normal(jax.random.key(1), (4, img, img, 3),
                               jnp.float32)
    return cfg, model, params, images


def test_cp_logits_match_sequential_padded_tokens():
    # 16px/8 ⇒ 5 tokens over ctx=4 ⇒ pad to 8: exercises key masking and
    # pad-query rows
    cfg, model, params, images = _setup()
    ref = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, deterministic=True))(params, images)
    mesh = make_cp_mesh(4)
    out = jax.jit(ctx_forward_fn(mesh, cfg))(params, images)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_cp_logits_match_sequential_exact_split():
    # 24px/8 ⇒ 10 tokens over ctx=2: no padding
    cfg, model, params, images = _setup(img=24)
    ref = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, deterministic=True))(params, images)
    out = jax.jit(ctx_forward_fn(make_cp_mesh(2), cfg))(params, images)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_cp_param_gradients_match_sequential():
    cfg, model, params, images = _setup()
    tgt = jax.random.normal(jax.random.key(2), (4, 14), jnp.float32)
    mesh = make_cp_mesh(4, data=2)
    fwd = ctx_forward_fn(mesh, cfg)

    def seq_loss(p):
        return jnp.mean((model.apply(
            {"params": p}, images, deterministic=True) - tgt) ** 2)

    def cp_loss(p):
        return jnp.mean((fwd(p, images) - tgt) ** 2)

    g_seq = jax.jit(jax.grad(seq_loss))(params)
    g_cp = jax.jit(jax.grad(cp_loss))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5),
        g_seq, g_cp,
    )


def test_cp_rejects_moe_models():
    cfg, _, params, images = _setup()
    mcfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 2, "num_heads": 2,
                  "moe": {"enabled": True, "num_experts": 2}},
    }).model
    with pytest.raises(ValueError, match="moe"):
        ctx_forward(make_cp_mesh(4), mcfg, params, images)


def _graph_setup(img=16, patch=8, graph=None, depth=2):
    graph = {"enabled": True, "num_blocks": 2, "adjacency": "knn",
             "k": 2} | (graph or {})
    cfg = from_dict({
        "model": {"name": "custom", "img_size": img, "patch_size": patch,
                  "embed_dim": 32, "depth": depth, "num_heads": 2,
                  "num_classes": 14, "drop_rate": 0.0, "graph": graph},
    }).model
    model = build_model(cfg, precision="fp32", attn_impl="xla",
                        mlp_impl="xla", graph_impl="xla")
    params = init_params(model, jax.random.key(0))
    # a zero gate would hide the graph branch entirely — open it
    for j in range(cfg.graph.num_blocks):
        if f"graph_{j}" not in params:
            continue  # duplicate insertion sites collapse at tiny depths
        params[f"graph_{j}"]["gate"] = jnp.float32(0.7)
        if cfg.graph.adjacency == "learned_static":
            params[f"graph_{j}"]["adj_logits"] = (
                jax.random.normal(jax.random.key(10 + j),
                                  params[f"graph_{j}"]["adj_logits"].shape)
            )
    images = jax.random.normal(jax.random.key(1), (4, img, img, 3),
                               jnp.float32)
    return cfg, model, params, images


@pytest.mark.parametrize("graph", [
    {"adjacency": "knn", "k": 2},                         # dynamic kNN
    {"adjacency": "knn", "k": 2, "dynamic": False},       # static reuse
    {"adjacency": "threshold", "threshold": 0.1},
    {"adjacency": "dense"},
    {"adjacency": "learned_static"},
    {"adjacency": "knn", "k": 2, "include_cls": True},
], ids=["knn", "knn_static", "threshold", "dense", "learned", "cls"])
def test_cp_graph_logits_match_sequential(graph):
    """VERDICT r3 #3: the graph branch under context parallelism — every
    adjacency mode, token-sharded rows, logits equal to the sequential
    model INCLUDING the padded (non-dividing) token count (5 tokens over
    ctx=4: CLS masking + pad-column masking + top-k tie order)."""
    cfg, model, params, images = _graph_setup(graph=graph)
    ref = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, deterministic=True))(params, images)
    out = jax.jit(ctx_forward_fn(make_cp_mesh(4), cfg))(params, images)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_cp_graph_logits_match_exact_split():
    # 24px/8 ⇒ 10 tokens over ctx=2: no padding, kNN across the shard seam
    cfg, model, params, images = _graph_setup(img=24, graph={"k": 3})
    ref = jax.jit(lambda p, x: model.apply(
        {"params": p}, x, deterministic=True))(params, images)
    out = jax.jit(ctx_forward_fn(make_cp_mesh(2), cfg))(params, images)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("graph", [
    {"adjacency": "knn", "k": 2},
    {"adjacency": "learned_static"},
], ids=["knn", "learned"])
def test_cp_graph_param_gradients_match_sequential(graph):
    """Param grads (incl. the graph block's value/proj/gate/adj_logits)
    through the token-sharded adjacency equal the sequential model's, on a
    ctx×data mesh."""
    cfg, model, params, images = _graph_setup(graph=graph)
    tgt = jax.random.normal(jax.random.key(2), (4, 14), jnp.float32)
    fwd = ctx_forward_fn(make_cp_mesh(4, data=2), cfg)

    def seq_loss(p):
        return jnp.mean((model.apply(
            {"params": p}, images, deterministic=True) - tgt) ** 2)

    def cp_loss(p):
        return jnp.mean((fwd(p, images) - tgt) ** 2)

    g_seq = jax.jit(jax.grad(seq_loss))(params)
    g_cp = jax.jit(jax.grad(cp_loss))(params)
    # the graph branch must actually contribute
    gnorm = sum(
        float(jnp.sum(jnp.abs(v)))
        for v in jax.tree.leaves(g_seq.get("graph_0", {})))
    assert gnorm > 0
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5),
        g_seq, g_cp,
    )
