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

    assert _v4_fits(12, 197, 64, 2)        # ViT-B/16 @224, bf16
    assert not _v4_fits(12, 577, 64, 2)    # ViT-B/16 @384 backward


def test_v4_all_model_scales():
    """The v4 lane-slice kernel must be exact for every preset head count
    (ViT-T h=3, S h=6, B h=12, L h=16 — odd head counts hit 64-lane offsets
    that are not 128-aligned)."""
    import jax
    import numpy as np

    from gavit_tpu.ops.attention import _fused_qkv5, _fused_qkv_flat

    d = 8
    for i, h in enumerate((3, 6, 12, 16)):
        b, n = 2, 11
        qkv = jax.random.normal(jax.random.key(i), (b, n, 3, h, d))
        scale = d ** -0.5
        out = _fused_qkv_flat(qkv.reshape(b, n, 3 * h * d), scale, h, d)
        ref = _fused_qkv5(qkv.transpose(0, 2, 3, 1, 4), scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, err_msg=f"h={h}")


def test_model_level_large_n_routes_through_v5():
    """A 512px model (N=1025) exceeds the exact kernels' VMEM budget — the
    dispatcher must route to the blockwise path and still match the
    reference attention end-to-end through the full model fwd+bwd."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gavit_tpu.config import from_dict
    from gavit_tpu.models.vit import build_model, init_params

    cfg = from_dict({"model": {
        "name": "custom", "img_size": 512, "patch_size": 16, "embed_dim": 32,
        "depth": 1, "num_heads": 2, "num_classes": 3, "drop_rate": 0.0,
        "graph": {"enabled": False},
    }})
    x = jax.random.normal(jax.random.key(0), (1, 512, 512, 3))

    outs = {}
    for impl in ("pallas", "reference"):
        model = build_model(cfg.model, precision="fp32", attn_impl=impl)
        params = init_params(model, jax.random.key(1))

        def loss(p):
            return jnp.sum(
                model.apply({"params": p}, x, deterministic=True) ** 2
            )

        val, grads = jax.value_and_grad(loss)(params)
        outs[impl] = (float(val), grads)

    v5_val, v5_g = outs["pallas"]
    ref_val, ref_g = outs["reference"]
    np.testing.assert_allclose(v5_val, ref_val, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(v5_g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   rtol=1e-3)


def test_v4_fwd_only_backward_fallback():
    """fwd_only dispatch (deterministic inference) must still be safely
    differentiable — the VJP routes through the v3 backward when the
    flat-row backward exceeds the VMEM budget (Grad-CAM at 384px)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gavit_tpu.ops.attention import (
        _fused_qkv5,
        _fused_qkv_flat,
        _v4_fits,
    )

    # shapes where ONLY the forward fits (the 384px regime, scaled down by
    # shrinking the budget ratio is impractical — instead just verify the
    # fallback path computes the same grads as v3 on any shape)
    b, n, h, d = 2, 13, 4, 8
    qkv = jax.random.normal(jax.random.key(3), (b, n, 3, h, d))
    scale = d ** -0.5

    def loss_flat(x):
        return jnp.sum(_fused_qkv_flat(x.reshape(b, n, 3 * h * d),
                                       scale, h, d) ** 2)

    def loss_v3(x):
        return jnp.sum(_fused_qkv5(x.transpose(0, 2, 3, 1, 4), scale) ** 2)

    # force the fallback branch by monkeypatching the fits check
    import gavit_tpu.ops.attention as att
    orig = att._v4_fits
    att._v4_fits = lambda *a, **k: False
    try:
        g_fallback = jax.grad(loss_flat)(qkv)
    finally:
        att._v4_fits = orig
    g_v3 = jax.grad(loss_v3)(qkv)
    np.testing.assert_allclose(np.asarray(g_fallback), np.asarray(g_v3),
                               atol=1e-5)
    # the real 384px regime: fwd fits, full does not
    assert _v4_fits(12, 577, 64, 2, fwd_only=True)
    assert not _v4_fits(12, 577, 64, 2)
