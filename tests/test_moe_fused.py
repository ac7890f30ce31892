"""Fused grouped-MoE megakernel (ops/moe_fused.py) — CPU interpret-mode
contract: the tiled-grouping invariants, exact forward and gradient
agreement with the unfused grouped engine (whose own contract is pinned
against a dense per-choice reference in tests/test_moe_grouped.py), empty
and hot experts, and the padded combine's zero-cotangent guarantee for pad
rows."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gavit_tpu.models.moe import router_topk
from gavit_tpu.ops.moe_fused import (
    combine_rows_padded,
    fused_cap,
    group_by_expert_tiled,
    grouped_moe_mlp_fused,
)
from gavit_tpu.ops.moe_grouped import grouped_moe_mlp


def _toy(seed=0, g=3, s=17, d=16, f=32, e=4, k=2, logits_fn=None):
    rng = np.random.RandomState(seed)
    x = jnp.array(rng.randn(g, s, d), jnp.float32)
    logits = jnp.array(rng.randn(g, s, e), jnp.float32)
    if logits_fn is not None:
        logits = logits_fn(logits)
    w1 = jnp.array(rng.randn(e, d, f) * 0.1, jnp.float32)
    b1 = jnp.array(rng.randn(e, f) * 0.1, jnp.float32)
    w2 = jnp.array(rng.randn(e, f, d) * 0.1, jnp.float32)
    b2 = jnp.array(rng.randn(e, d) * 0.1, jnp.float32)
    gv, gi, _ = router_topk(logits, k)
    return x, gv, gi, (w1, b1, w2, b2)


def test_tiled_grouping_invariants():
    tm, e = 8, 4
    _, _, gi, _ = _toy()
    t = gi.size
    dest, src, used, tile_group, group_sizes = group_by_expert_tiled(
        gi, e, tm)
    cap = fused_cap(t, e, tm)
    dest = np.asarray(dest)
    # injective into [0, cap)
    assert dest.min() >= 0 and dest.max() < cap
    assert len(np.unique(dest)) == t
    # src inverts dest; used marks exactly the real rows
    np.testing.assert_array_equal(np.asarray(src)[dest], np.arange(t))
    assert int(np.asarray(used).sum()) == t
    assert np.asarray(used)[dest].all()
    # group sizes: tile-aligned, >= one tile each, sum to cap
    gs = np.asarray(group_sizes)
    assert (gs % tm == 0).all() and (gs >= tm).all()
    assert gs.sum() == cap
    # every real row's expert matches its tile's owner (tail tiles only
    # ever hold pad rows, so booking them to the last expert is invisible)
    flat = np.asarray(gi).reshape(-1)
    owners = np.asarray(tile_group)[dest // tm]
    np.testing.assert_array_equal(owners, flat)


def test_tiled_grouping_empty_and_hot_experts():
    """An expert with zero routed rows still owns >= 1 (all-pad) tile, and
    a hot expert's region covers its full load."""
    tm, e = 8, 4
    # every pair goes to experts 1 or 2 — experts 0 and 3 are empty
    x, gv, gi, _ = _toy(logits_fn=lambda lg: lg.at[..., 0].set(-100.0)
                        .at[..., 3].set(-100.0))
    dest, src, used, tile_group, group_sizes = group_by_expert_tiled(
        gi, e, tm)
    gs = np.asarray(group_sizes)
    assert gs[0] == tm                      # empty expert: one pad tile
    flat = np.asarray(gi).reshape(-1)
    assert gs[1] >= (flat == 1).sum()
    tg = np.asarray(tile_group)
    assert (np.diff(tg) >= 0).all()         # tiles expert-sorted
    for exp in range(e):
        assert (tg == exp).sum() == gs[exp] // tm


@pytest.mark.parametrize("logits_fn", [None,
                                       lambda lg: lg.at[..., 0].set(100.0)])
def test_fused_matches_unfused_forward_and_grads(logits_fn):
    """Fused megakernel (interpret mode) == the unfused grouped engine,
    forward and all gradients, including with one saturated-hot expert."""
    x, gv, gi, weights = _toy(logits_fn=logits_fn)
    key = jax.random.PRNGKey(0)

    def loss_ref(x, gv, w):
        out = grouped_moe_mlp(x, gv, gi, *w, key, matmul_impl="ragged_dot")
        return jnp.sum(out ** 2), out

    def loss_fused(x, gv, w):
        out = grouped_moe_mlp_fused(x, gv, gi, *w, key, interpret=True)
        return jnp.sum(out ** 2), out

    (l_ref, o_ref), g_ref = jax.value_and_grad(
        loss_ref, argnums=(0, 1, 2), has_aux=True)(x, gv, weights)
    (l_f, o_f), g_f = jax.value_and_grad(
        loss_fused, argnums=(0, 1, 2), has_aux=True)(x, gv, weights)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_ref), atol=1e-5)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_tanh_gelu_variant():
    """approx_gelu=True (the bf16 serving form) matches the unfused
    engine's tanh path."""
    x, gv, gi, weights = _toy(seed=3)
    key = jax.random.PRNGKey(0)
    ref = grouped_moe_mlp(x, gv, gi, *weights, key,
                          matmul_impl="ragged_dot", approx_gelu=True)
    out = grouped_moe_mlp_fused(x, gv, gi, *weights, key,
                                approx_gelu=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_padded_combine_zero_cotangent_for_pad_rows():
    """The pad rows of the tiled buffer receive exactly zero upstream
    cotangent — the contract that makes their garbage forward values (and
    their booking into the last tgmm group) harmless."""
    tm, e = 8, 4
    _, _, gi, _ = _toy()
    t = gi.size
    dest, src, used, _, _ = group_by_expert_tiled(gi, e, tm)
    cap = int(np.asarray(used).shape[0])
    y = jnp.array(np.random.RandomState(0).randn(cap, 5), jnp.float32)

    out, vjp = jax.vjp(lambda y: combine_rows_padded(y, dest, src, used), y)
    (dy,) = vjp(jnp.ones((t, 5), jnp.float32))
    dy = np.asarray(dy)
    pad_rows = ~np.asarray(used)
    assert pad_rows.any()
    np.testing.assert_array_equal(dy[pad_rows], 0.0)
    # real rows each receive exactly their (single) upstream row
    np.testing.assert_array_equal(dy[~pad_rows], 1.0)


def test_fused_dropout_training_path(monkeypatch):
    """drop > 0 in training mode: runs under the interpret-mode PRNG
    emulation, gradient flows, and the forward differs from the
    deterministic one (masks actually applied)."""
    from jax.experimental.pallas import tpu as pltpu

    from tests.test_kernels_interpret import _make_prng_emulation

    seed_fn, bits_fn = _make_prng_emulation()
    monkeypatch.setattr(pltpu, "prng_seed", seed_fn)
    monkeypatch.setattr(pltpu, "prng_random_bits", bits_fn)

    x, gv, gi, weights = _toy()
    key = jax.random.PRNGKey(7)
    with pltpu.force_tpu_interpret_mode():
        det = grouped_moe_mlp_fused(x, gv, gi, *weights, key,
                                    interpret=True)
        dropped = grouped_moe_mlp_fused(
            x, gv, gi, *weights, key, drop=0.3, deterministic=False,
            interpret=True)

        def loss(w):
            out = grouped_moe_mlp_fused(
                x, gv, gi, *w, key, drop=0.3, deterministic=False,
                interpret=True)
            return jnp.sum(out ** 2)

        val, grads = jax.value_and_grad(loss)(weights)
    assert np.isfinite(float(val))
    assert float(jnp.max(jnp.abs(np.asarray(dropped)
                                 - np.asarray(det)))) > 1e-4
    for g in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(g)).all()


def test_fused_ep_matches_unfused_ep_including_drops():
    """grouped_moe_mlp_ep_fused == the unfused EP shard op: same per-expert
    capacity-drop semantics, same partial-output contract (remote pairs
    contribute zero), forward AND gradients."""
    from gavit_tpu.ops.moe_fused import grouped_moe_mlp_ep_fused
    from gavit_tpu.ops.moe_grouped import grouped_moe_mlp_ep

    x, gv, _, weights = _toy(g=2, s=8, e=4)
    # expert 0 hot (drops past cap), second choices over 1-3; this shard
    # owns experts 0-1 only (first=0, e_loc=2) -> expert 2/3 pairs remote
    second = (np.arange(16).reshape(2, 8) % 3 + 1).astype(np.int32)
    gi = jnp.stack([jnp.zeros((2, 8), jnp.int32), jnp.asarray(second)],
                   axis=-1)
    w_loc = tuple(w[:2] for w in weights)
    key = jax.random.PRNGKey(0)
    cpe = 10

    def ref(x, gv, w):
        out = grouped_moe_mlp_ep(x, gv, gi, *w, key, first=0,
                                 cap_per_expert=cpe,
                                 matmul_impl="ragged_dot")
        return jnp.sum(out ** 2), out

    def fused(x, gv, w):
        out = grouped_moe_mlp_ep_fused(x, gv, gi, *w, key, first=0,
                                       cap_per_expert=cpe, interpret=True)
        return jnp.sum(out ** 2), out

    (l_r, o_r), g_r = jax.value_and_grad(ref, argnums=(0, 1, 2),
                                         has_aux=True)(x, gv, w_loc)
    (l_f, o_f), g_f = jax.value_and_grad(fused, argnums=(0, 1, 2),
                                         has_aux=True)(x, gv, w_loc)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_r), atol=1e-5)
    np.testing.assert_allclose(float(l_f), float(l_r), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_fused_tanh_gelu_gradients_match_unfused():
    """approx_gelu=True backward uses the TANH derivative (r5 review #6 —
    an erf-gradient for a tanh forward would be silently wrong): grads
    match the unfused engine's autodiff through the tanh GELU."""
    x, gv, gi, weights = _toy(seed=5)
    key = jax.random.PRNGKey(0)

    def loss_ref(w):
        out = grouped_moe_mlp(x, gv, gi, *w, key, matmul_impl="ragged_dot",
                              approx_gelu=True)
        return jnp.sum(out ** 2)

    def loss_fused(w):
        out = grouped_moe_mlp_fused(x, gv, gi, *w, key, approx_gelu=True,
                                    interpret=True)
        return jnp.sum(out ** 2)

    g_ref = jax.grad(loss_ref)(weights)
    g_f = jax.grad(loss_fused)(weights)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
