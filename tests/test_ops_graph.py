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


def _duplicate_tokens(b=2, n=16, d=8, n_dup=6, seed=5):
    """Tokens where the first n_dup rows are IDENTICAL (black-border patches
    on real X-rays produce exactly this) → many exact similarity ties."""
    t = np.array(jax.random.normal(jax.random.key(seed), (b, n, d)))
    t[:, :n_dup] = t[:, :1]
    return jnp.asarray(t)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_knn_exactly_k_edges_with_duplicate_tokens(dtype):
    """Duplicate similarities must still select exactly k edges per row
    (the old >=kth threshold over-selected on ties)."""
    k = 3
    t = _duplicate_tokens().astype(dtype)
    adj = np.asarray(build_adjacency(t, mode="knn", k=k)).astype(np.float32)
    nz = (adj > 1e-6).sum(-1)
    assert (nz == k).all(), f"edge counts {np.unique(nz)}"
    np.testing.assert_allclose(adj.sum(-1), 1.0, atol=3e-3)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_knn_matches_xla_with_duplicate_tokens(dtype):
    """Fused kernel and XLA path must agree on tie-broken adjacencies —
    both resolve ties to lower indices (stable top_k rule)."""
    t = _duplicate_tokens().astype(dtype)
    v = jax.random.normal(jax.random.key(9), t.shape).astype(dtype)
    ref = graph_aggregate(build_adjacency(t, mode="knn", k=3), v)
    fused = fused_graph_aggregate(t, v, "knn", 3)
    atol = 1e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(ref, np.float32), atol=atol
    )


def test_knn_tie_break_prefers_lower_indices():
    """With all tokens identical, every off-diagonal sim ties at 1.0: the
    k selected neighbours must be the lowest non-self indices, in BOTH paths."""
    b, n, d, k = 1, 8, 4, 3
    t = jnp.broadcast_to(jax.random.normal(jax.random.key(1), (1, 1, d)),
                         (b, n, d))
    adj = np.asarray(build_adjacency(t, mode="knn", k=k))
    for i in range(n):
        expected = [j for j in range(n) if j != i][:k]
        got = list(np.nonzero(adj[0, i] > 1e-9)[0])
        assert got == expected, f"row {i}: {got} != {expected}"

    v = jax.random.normal(jax.random.key(2), (b, n, d))
    fused = fused_graph_aggregate(t, v, "knn", k)
    ref = graph_aggregate(jnp.asarray(adj), v)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-5)


def test_fused_knn_grad_consistent_with_forward_on_ties():
    """The custom-VJP backward rebuilds the adjacency via the XLA path; with
    deterministic tie-breaks its gradients must equal differentiating the
    XLA composition directly, even on duplicate tokens."""
    t = _duplicate_tokens(b=1, n=10, d=6)
    v = jax.random.normal(jax.random.key(3), t.shape)

    def f_fused(t, v):
        return jnp.sum(fused_graph_aggregate(t, v, "knn", 3) ** 2)

    def f_ref(t, v):
        return jnp.sum(
            graph_aggregate(build_adjacency(t, mode="knn", k=3), v) ** 2
        )

    gt_f, gv_f = jax.grad(f_fused, argnums=(0, 1))(t, v)
    gt_r, gv_r = jax.grad(f_ref, argnums=(0, 1))(t, v)
    np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv_f), np.asarray(gv_r), atol=1e-5)


# ---------------------------------------------------------------------------
# r5: large-N chunked path + size dispatcher
# ---------------------------------------------------------------------------


def _rand(b, n, d, seed=0):
    rng = np.random.RandomState(seed)
    t = jnp.asarray(rng.randn(b, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, n, d), jnp.float32)
    return t, v


@pytest.mark.parametrize("mode,kwargs", [
    ("knn", {"k": 4}),
    ("dense", {}),
    ("threshold", {"threshold": 0.2}),
])
def test_chunked_matches_reference_forward_and_grads(mode, kwargs):
    """graph_aggregate_chunked == build_adjacency + graph_aggregate, fwd
    and gradients, at a chunk that does NOT divide N (pad-row path)."""
    from gavit_tpu.ops.graph_ops import (build_adjacency,
                                         graph_aggregate,
                                         graph_aggregate_chunked)

    t, v = _rand(2, 37, 16)

    def ref(t, v):
        adj = build_adjacency(t, mode=mode, temperature=0.7, **kwargs)
        return jnp.sum(graph_aggregate(adj, v) ** 2)

    def chunked(t, v):
        out = graph_aggregate_chunked(t, v, mode=mode, temperature=0.7,
                                      chunk=16, **kwargs)
        return jnp.sum(out ** 2)

    l_ref, g_ref = jax.value_and_grad(ref, argnums=(0, 1))(t, v)
    l_c, g_c = jax.value_and_grad(chunked, argnums=(0, 1))(t, v)
    np.testing.assert_allclose(float(l_c), float(l_ref), rtol=1e-5)
    for a, b in zip(g_c, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_chunked_knn_duplicate_token_ties_match_reference():
    """The chunked path uses the SAME stable lax.top_k — duplicate tokens
    (identical similarities) select identical edges to the XLA path."""
    from gavit_tpu.ops.graph_ops import (build_adjacency, graph_aggregate,
                                         graph_aggregate_chunked)

    rng = np.random.RandomState(3)
    t = np.tile(rng.randn(1, 1, 8), (1, 24, 1)).astype(np.float32)  # all dup
    v = rng.randn(1, 24, 8).astype(np.float32)
    ref = graph_aggregate(build_adjacency(jnp.asarray(t), mode="knn", k=5),
                          jnp.asarray(v))
    out = graph_aggregate_chunked(jnp.asarray(t), jnp.asarray(v),
                                  mode="knn", k=5, chunk=7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_size_dispatcher_routes_large_n_to_chunked():
    """fused_graph_aggregate: kernel within the VMEM budget, chunked past
    the cliff — and the large-N branch agrees with the XLA reference."""
    from gavit_tpu.ops.graph_ops import (build_adjacency, graph_aggregate,
                                         fused_graph_aggregate,
                                         needs_chunked)

    assert not needs_chunked(197, 768, 2)      # flagship 224px
    assert not needs_chunked(577, 768, 2)      # 384px
    assert needs_chunked(1025, 768, 2)         # 512px
    assert needs_chunked(4097, 768, 2)         # 1024px (north-star scale)

    t, v = _rand(1, 1025, 8, seed=5)
    ref = graph_aggregate(build_adjacency(t, mode="knn", k=8), v)
    out = fused_graph_aggregate(t, v, "knn", 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_chunk_picker_minimises_padding():
    from gavit_tpu.ops.graph_ops import _pick_chunk

    assert _pick_chunk(1025) == 384            # pads to 1152 (vs 1536/1280)
    # huge N: the scoped-VMEM element cap bounds the slice (chunk*N <= 600k
    # — the r5 1024px-train overflow fix), so 4097 drops to 128
    assert _pick_chunk(4097) == 128
    assert _pick_chunk(4097) * 4097 <= 600_000
    assert 0 < _pick_chunk(197) < 197          # small n: a valid chunk


def test_chunked_iter_topk_matches_lax_topk(monkeypatch):
    """The 'iter' selection (k leftmost-max extractions) == lax.top_k
    selection, including duplicate-similarity ties."""
    from gavit_tpu.ops import graph_ops as go

    rng = np.random.RandomState(0)
    t = rng.randn(2, 29, 8).astype(np.float32)
    t[0, 5] = t[0, 9] = t[0, 13]          # exact duplicates -> ties
    v = rng.randn(2, 29, 8).astype(np.float32)
    ref = go.graph_aggregate_chunked(jnp.asarray(t), jnp.asarray(v),
                                     mode="knn", k=6, chunk=8)
    monkeypatch.setenv("GAVIT_GRAPH_TOPK", "iter")
    out = go.graph_aggregate_chunked(jnp.asarray(t), jnp.asarray(v),
                                     mode="knn", k=6, chunk=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
