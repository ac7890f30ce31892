"""Packed-QKV fused attention kernel (v2) vs the reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from gavit_tpu.ops.attention import attention_reference, fused_qkv_attention


def _qkv(b=2, n=37, h=3, d=16, seed=0):
    return jax.random.normal(jax.random.key(seed), (b, n, 3, h, d))


def _ref(qkv, scale):
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    out = attention_reference(q, k, v, scale)
    return out.transpose(0, 2, 1, 3)


def test_forward_matches_reference():
    qkv = _qkv()
    scale = 0.25
    out = fused_qkv_attention(qkv, scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(qkv, scale)), atol=1e-5
    )


def test_forward_vit_shapes():
    qkv = _qkv(b=2, n=197, h=4, d=32, seed=1)  # ragged ViT sequence length
    scale = 32 ** -0.5
    out = fused_qkv_attention(qkv, scale)
    assert out.shape == (2, 197, 4, 32)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(qkv, scale)), atol=1e-5
    )


def test_gradients_match_reference():
    qkv = _qkv(n=21)
    scale = 16 ** -0.5

    g_fused = jax.grad(lambda q: jnp.sum(fused_qkv_attention(q, scale) ** 2))(qkv)
    g_ref = jax.grad(lambda q: jnp.sum(_ref(q, scale) ** 2))(qkv)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), atol=1e-4
    )


def test_bf16_path():
    qkv = _qkv(n=24).astype(jnp.bfloat16)
    out = fused_qkv_attention(qkv, 0.25)
    assert out.dtype == jnp.bfloat16
    ref = _ref(qkv, 0.25)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_v4_flat_and_v3_transposed_agree():
    """Both kernel layouts (v4 lane-sliced flat rows; v3 transposed
    [B,3,H,N,d]) must produce identical attention — v4 is the default at
    224px, v3 the large-N fallback, and the dispatcher switches on a VMEM
    estimate (``_v4_fits``)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gavit_tpu.ops.attention import _fused_qkv5, _fused_qkv_flat

    b, n, h, d = 2, 13, 4, 8
    qkv = jax.random.normal(jax.random.key(0), (b, n, 3, h, d))
    scale = d ** -0.5
    out_flat = _fused_qkv_flat(qkv.reshape(b, n, 3 * h * d), scale, h, d)
    out_v3 = _fused_qkv5(qkv.transpose(0, 2, 3, 1, 4), scale)
    np.testing.assert_allclose(np.asarray(out_flat), np.asarray(out_v3),
                               atol=1e-6)

    def loss_flat(x):
        return jnp.sum(_fused_qkv_flat(x.reshape(b, n, 3 * h * d),
                                       scale, h, d) ** 2)

    def loss_v3(x):
        return jnp.sum(_fused_qkv5(x.transpose(0, 2, 3, 1, 4), scale) ** 2)

    g_flat = jax.grad(loss_flat)(qkv)
    g_v3 = jax.grad(loss_v3)(qkv)
    np.testing.assert_allclose(np.asarray(g_flat), np.asarray(g_v3),
                               atol=1e-5)


def test_v4_fits_dispatch_boundary():
    """224px ViT-B fits the flat-row kernel; 384px backward must not."""
    from gavit_tpu.ops.attention import _v4_fits

    assert _v4_fits(128, 12, 197, 64, 2)        # ViT-B/16 @224, bf16
    assert not _v4_fits(16, 12, 577, 64, 2)     # ViT-B/16 @384 backward
