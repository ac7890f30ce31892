"""Fused dropout: distribution, determinism, fwd/bwd mask consistency.

On CPU these exercise the XLA fallback (the pallas interpreter's PRNG is a
zero stub); the hardware-PRNG kernel path is validated on TPU by the perf
probes (keep-fraction recorded in BASELINE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gavit_tpu.ops.dropout import dropout_seed, fused_dropout


def test_keep_fraction_and_scale():
    x = jnp.ones((8, 64, 64))
    seed = dropout_seed(jax.random.key(0))
    y = np.asarray(fused_dropout(x, seed, 0.25))
    keep = (y != 0).mean()
    assert 0.70 < keep < 0.80
    np.testing.assert_allclose(y[y != 0], 1 / 0.75, rtol=1e-5)
    # expectation preserved
    assert abs(y.mean() - 1.0) < 0.02


def test_deterministic_per_seed():
    x = jnp.ones((4, 32, 32))
    s1 = dropout_seed(jax.random.key(1))
    s2 = dropout_seed(jax.random.key(2))
    a = np.asarray(fused_dropout(x, s1, 0.5))
    b = np.asarray(fused_dropout(x, s1, 0.5))
    c = np.asarray(fused_dropout(x, s2, 0.5))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_backward_uses_same_mask():
    """The gradient mask must equal the forward mask (regenerated, not
    stored) — otherwise training silently corrupts."""
    x = jnp.ones((4, 16, 32))
    seed = dropout_seed(jax.random.key(3))
    y = np.asarray(fused_dropout(x, seed, 0.4))
    g = np.asarray(jax.grad(
        lambda x: jnp.sum(fused_dropout(x, seed, 0.4))
    )(x))
    np.testing.assert_array_equal(y != 0, g != 0)
    np.testing.assert_allclose(g[g != 0], 1 / 0.6, rtol=1e-5)


def test_jit_and_bf16():
    x = jnp.ones((2, 16, 16), jnp.bfloat16)
    seed = dropout_seed(jax.random.key(4))
    y = jax.jit(lambda x, s: fused_dropout(x, s, 0.1))(x, seed)
    assert y.dtype == jnp.bfloat16


def test_fused_dropout_add_matches_composition():
    """residual + dropout(y) fused in one pass == the two-op composition
    with the same seed (both paths share the mask generator)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gavit_tpu.ops.dropout import fused_dropout, fused_dropout_add

    y = jax.random.normal(jax.random.key(0), (4, 16, 32))
    r = jax.random.normal(jax.random.key(1), (4, 16, 32))
    seed = jnp.asarray([77], jnp.int32)
    fused = fused_dropout_add(y, r, seed, 0.3)
    composed = r + fused_dropout(y, seed, 0.3)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(composed),
                               atol=1e-6)


def test_fused_dropout_add_grads():
    """d_residual = g exactly; d_y = the forward mask applied to g."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gavit_tpu.ops.dropout import fused_dropout_add

    y = jax.random.normal(jax.random.key(0), (2, 8, 16))
    r = jax.random.normal(jax.random.key(1), (2, 8, 16))
    seed = jnp.asarray([5], jnp.int32)

    out, vjp = jax.vjp(lambda y, r: fused_dropout_add(y, r, seed, 0.25), y, r)
    g = jax.random.normal(jax.random.key(2), out.shape)
    dy, dr = vjp(g)
    np.testing.assert_array_equal(np.asarray(dr), np.asarray(g))
    # mask identity with the forward: dropped positions (where out == r)
    dropped = np.asarray(out) == np.asarray(r)
    assert dropped.any() and not dropped.all()
    np.testing.assert_array_equal(np.asarray(dy) == 0.0, dropped)
    kept = ~dropped
    np.testing.assert_allclose(
        np.asarray(dy)[kept], (np.asarray(g) / 0.75)[kept], rtol=1e-5
    )


def test_fused_gelu_dropout_matches_composition():
    """dropout(gelu_exact(y)) fused in one pass == the composition with the
    same seed (shared mask generator), in fp32 and bf16."""
    from gavit_tpu.ops.dropout import fused_dropout, fused_gelu_dropout

    for dtype in (jnp.float32, jnp.bfloat16):
        y = jax.random.normal(jax.random.key(0), (4, 16, 32)).astype(dtype)
        seed = jnp.asarray([91], jnp.int32)
        fused = fused_gelu_dropout(y, seed, 0.3)
        composed = fused_dropout(
            jax.nn.gelu(y.astype(jnp.float32), approximate=False)
            .astype(dtype),
            seed, 0.3,
        )
        # bf16: the composition rounds twice (gelu→bf16, then rescale→bf16)
        # while the fused kernel rounds once — allow ~2 ulp relative slack
        np.testing.assert_allclose(
            np.asarray(fused, np.float32), np.asarray(composed, np.float32),
            rtol=(1e-6 if dtype == jnp.float32 else 2e-2),
            atol=(1e-6 if dtype == jnp.float32 else 2e-2),
        )


def test_fused_gelu_dropout_grads():
    """VJP == autodiff of the same-mask composition: mask regenerated from
    the seed, gelu' recomputed from the saved input."""
    from gavit_tpu.ops.dropout import fused_dropout, fused_gelu_dropout

    y = jax.random.normal(jax.random.key(7), (2, 8, 16))
    seed = jnp.asarray([13], jnp.int32)
    g = jax.random.normal(jax.random.key(8), y.shape)

    _, vjp = jax.vjp(lambda y: fused_gelu_dropout(y, seed, 0.25), y)
    (dy,) = vjp(g)

    def composed(y):
        return fused_dropout(jax.nn.gelu(y, approximate=False), seed, 0.25)

    _, vjp_ref = jax.vjp(composed, y)
    (dy_ref,) = vjp_ref(g)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(dy_ref),
                               rtol=1e-4, atol=1e-6)
