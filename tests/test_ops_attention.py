"""Fused Pallas attention vs the XLA reference path (fwd + grads)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gavit_tpu.ops.attention import (
    attention_pallas,
    attention_reference,
    multi_head_attention,
)


def _qkv(b=2, h=3, n=37, d=16, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(seed), 3)
    shape = (b, h, n, d)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


def test_forward_matches_reference():
    q, k, v = _qkv()
    scale = q.shape[-1] ** -0.5
    ref = attention_reference(q, k, v, scale)
    out = attention_pallas(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_forward_non_padded_sequence():
    q, k, v = _qkv(n=128)  # exactly one lane tile, no padding path
    scale = 0.25
    ref = attention_reference(q, k, v, scale)
    out = attention_pallas(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradients_match_reference():
    q, k, v = _qkv(n=21)
    scale = q.shape[-1] ** -0.5

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v, scale) ** 2)

    def loss_pal(q, k, v):
        return jnp.sum(attention_pallas(q, k, v, scale) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_pal, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_dispatcher_dropout_falls_back_to_reference():
    q, k, v = _qkv(n=8)
    out = multi_head_attention(
        q, k, v, impl="auto", dropout_rate=0.5,
        dropout_rng=jax.random.key(1),
    )
    assert out.shape == q.shape
    # same rng, explicit reference impl → identical
    out2 = multi_head_attention(
        q, k, v, impl="reference", dropout_rate=0.5,
        dropout_rng=jax.random.key(1),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_xla_impl_matches_reference():
    q, k, v = _qkv(n=33)
    scale = q.shape[-1] ** -0.5
    ref = attention_reference(q, k, v, scale)
    out = multi_head_attention(q, k, v, scale, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_jit_and_vmap_compatible():
    q, k, v = _qkv(n=19)
    f = jax.jit(lambda q, k, v: attention_pallas(q, k, v, 0.1))
    out = f(q, k, v)
    assert out.shape == q.shape


# ---------------------------------------------------------------------------
# v5: KV-blockwise flash path for large N
# ---------------------------------------------------------------------------


def test_v5_forward_matches_reference():
    """Blockwise online-softmax forward == reference, including a masked
    ragged tail block (N=300 pads to 512: two 256-blocks, 212 masked cols)."""
    from gavit_tpu.ops.attention import flash_attention_large

    b, h, n, d = 1, 2, 300, 32
    ks = jax.random.split(jax.random.key(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, n, d)) for kk in ks)
    scale = d ** -0.5
    ref = attention_reference(q, k, v, scale)
    out = flash_attention_large(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_v5_gradients_match_reference():
    from gavit_tpu.ops.attention import flash_attention_large

    b, h, n, d = 1, 2, 300, 32
    ks = jax.random.split(jax.random.key(1), 3)
    q, k, v = (jax.random.normal(kk, (b, h, n, d)) for kk in ks)
    scale = d ** -0.5

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v, scale) ** 2)

    g_ref = jax.grad(functools.partial(loss, attention_reference),
                     argnums=(0, 1, 2))(q, k, v)
    g_v5 = jax.grad(functools.partial(loss, flash_attention_large),
                    argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_v5, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


def test_v5_dispatch_boundary():
    """Exact kernels cover the model family (N=197/577); past the VMEM cliff
    the dispatchers must hand off to the blockwise path."""
    from gavit_tpu.ops.attention import _v3_fits

    assert _v3_fits(577, 64, 2)        # 384px bf16: exact v3 still fits
    assert not _v3_fits(1025, 64, 2)   # 512px would not — v5 territory


def test_v5_block_multiple_n():
    """N an exact block multiple (no padding, single masking branch)."""
    from gavit_tpu.ops.attention import flash_attention_large

    b, h, n, d = 2, 1, 256, 64
    ks = jax.random.split(jax.random.key(2), 3)
    q, k, v = (jax.random.normal(kk, (b, h, n, d)) for kk in ks)
    scale = d ** -0.5
    ref = attention_reference(q, k, v, scale)
    out = flash_attention_large(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
