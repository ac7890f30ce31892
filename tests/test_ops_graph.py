"""Graph ops: adjacency construction semantics + fused kernel parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gavit_tpu.ops.graph_ops import (
    build_adjacency,
    cosine_similarity,
    fused_graph_aggregate,
    graph_aggregate,
)


def _tokens(b=2, n=23, d=12, seed=0):
    return jax.random.normal(jax.random.key(seed), (b, n, d))


def test_cosine_similarity_against_numpy():
    t = np.asarray(_tokens())
    tn = t / np.linalg.norm(t, axis=-1, keepdims=True)
    expected = np.einsum("bid,bjd->bij", tn, tn)
    got = np.asarray(cosine_similarity(jnp.asarray(t)))
    np.testing.assert_allclose(got, expected, atol=1e-4)


def test_knn_adjacency_structure():
    k = 4
    adj = np.asarray(build_adjacency(_tokens(), mode="knn", k=k))
    # row-stochastic
    np.testing.assert_allclose(adj.sum(-1), 1.0, atol=1e-5)
    # exactly k nonzeros per row, none on the diagonal
    nz = (adj > 1e-9).sum(-1)
    assert (nz == k).all()
    assert (np.abs(np.diagonal(adj, axis1=1, axis2=2)) < 1e-9).all()


def test_threshold_adjacency_selects_similar_edges():
    t = _tokens(n=9)
    sim = np.asarray(cosine_similarity(t))
    adj = np.asarray(build_adjacency(t, mode="threshold", threshold=0.3))
    np.testing.assert_allclose(adj.sum(-1), 1.0, atol=1e-5)
    off_diag = ~np.eye(adj.shape[-1], dtype=bool)
    # every selected off-diagonal edge has sim > threshold
    selected = (adj > 1e-9) & off_diag
    assert (sim[selected] > 0.3).all()


def test_threshold_empty_rows_fall_back_to_self():
    # impossible threshold → every row falls back to pure self-edge
    adj = np.asarray(build_adjacency(_tokens(), mode="threshold", threshold=2.0))
    np.testing.assert_allclose(
        adj, np.broadcast_to(np.eye(adj.shape[-1]), adj.shape), atol=1e-6
    )


def test_dense_adjacency_masks_diagonal():
    adj = np.asarray(build_adjacency(_tokens(), mode="dense"))
    np.testing.assert_allclose(adj.sum(-1), 1.0, atol=1e-5)
    assert (np.abs(np.diagonal(adj, axis1=1, axis2=2)) < 1e-9).all()


def test_aggregate_against_numpy():
    adj = np.asarray(build_adjacency(_tokens(), mode="dense"))
    vals = np.asarray(_tokens(seed=1))
    expected = np.einsum("bij,bjd->bid", adj, vals)
    got = np.asarray(graph_aggregate(jnp.asarray(adj), jnp.asarray(vals)))
    np.testing.assert_allclose(got, expected, atol=1e-4)


@pytest.mark.parametrize("mode,kwargs", [
    ("dense", {}),
    ("knn", {"k": 5}),
    ("threshold", {"threshold": 0.2}),
])
def test_fused_kernel_matches_reference(mode, kwargs):
    t = _tokens(n=29, d=16)
    vals = _tokens(n=29, d=16, seed=1)
    ref = graph_aggregate(
        build_adjacency(t, mode=mode, temperature=0.7, **kwargs), vals
    )
    out = fused_graph_aggregate(
        t, vals, mode, kwargs.get("k", 8), kwargs.get("threshold", 0.0), 0.7
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fused_kernel_gradients():
    t = _tokens(n=17, d=8)
    vals = _tokens(n=17, d=8, seed=1)

    def loss_f(t, v):
        return jnp.sum(fused_graph_aggregate(t, v, "knn", 4, 0.0, 1.0) ** 2)

    def loss_r(t, v):
        adj = build_adjacency(t, mode="knn", k=4)
        return jnp.sum(graph_aggregate(adj, v) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1))(t, vals)
    gr = jax.grad(loss_r, argnums=(0, 1))(t, vals)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_temperature_sharpens_distribution():
    t = _tokens()
    sharp = np.asarray(build_adjacency(t, mode="dense", temperature=0.1))
    soft = np.asarray(build_adjacency(t, mode="dense", temperature=10.0))
    assert sharp.max() > soft.max()
