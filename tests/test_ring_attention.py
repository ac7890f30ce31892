"""Ring attention (context parallelism): exactness vs the reference op.

``parallel/ring.py`` shards the token axis over a mesh axis and rotates
K/V blocks with ppermute under an online-softmax accumulator. These tests
pin (a) outputs exactly equal to ``attention_reference`` (the same math the
reference's torch attention computes, /root/reference/src/models/vit.py:59-66),
(b) q/k/v gradients through the scan+ppermute backward, (c) composition
with a data axis and a head axis on a 2-D mesh, and (d) input validation.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gavit_tpu.ops.attention import attention_reference
from gavit_tpu.parallel.ring import (
    make_ctx_mesh,
    ring_attention,
    ring_attention_local,
)


def _qkv(b=2, h=3, n=32, d=8, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    shape = (b, h, n, d)
    return tuple(jax.random.normal(k, shape, dtype) for k in ks)


@pytest.mark.parametrize("ctx,n", [(8, 32), (4, 32), (2, 10), (8, 8)])
def test_ring_matches_reference(ctx, n):
    q, k, v = _qkv(n=n)
    scale = 0.25
    ref = attention_reference(q, k, v, scale)
    mesh = make_ctx_mesh(ctx)
    out = ring_attention(q, k, v, scale, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_ring_gradients_match_reference():
    q, k, v = _qkv(n=32)
    scale = 0.125
    mesh = make_ctx_mesh(8)
    tgt = jax.random.normal(jax.random.key(9), q.shape, q.dtype)

    def loss(fn):
        return lambda q, k, v: jnp.mean((fn(q, k, v) - tgt) ** 2)

    g_ref = jax.jit(jax.grad(
        loss(lambda q, k, v: attention_reference(q, k, v, scale)),
        argnums=(0, 1, 2)))(q, k, v)
    g_ring = jax.jit(jax.grad(
        loss(lambda q, k, v: ring_attention(q, k, v, scale, mesh)),
        argnums=(0, 1, 2)))(q, k, v)
    for a, b, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6,
            err_msg=f"d{name} diverged through the ring backward")


def test_ring_composes_with_data_and_head_axes():
    # 2×4 mesh: batch sharded over 'data', tokens over 'ctx'; then heads
    # over 'data' (head-TP × context parallelism) — heads are batch dims to
    # the ring, so both compositions must be exact.
    q, k, v = _qkv(b=4, h=2, n=16)
    scale = 0.3
    ref = attention_reference(q, k, v, scale)
    mesh = make_ctx_mesh(4, data=2)
    local = functools.partial(ring_attention_local, scale=scale,
                              axis_name="ctx")
    for spec in (P("data", None, "ctx", None), P(None, "data", "ctx", None)):
        out = jax.jit(jax.shard_map(
            local, mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
            check_vma=False,
        ))(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)


def test_ring_bf16_close_to_reference():
    q, k, v = _qkv(n=24, dtype=jnp.bfloat16)
    scale = 0.25
    ref = attention_reference(q, k, v, scale).astype(jnp.float32)
    out = ring_attention(q, k, v, scale, make_ctx_mesh(8)).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)


def test_ring_validates_divisibility():
    q, k, v = _qkv(n=30)
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(q, k, v, 0.25, make_ctx_mesh(8))
