"""Fused Pallas attention vs the XLA reference path (fwd + grads)."""

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
