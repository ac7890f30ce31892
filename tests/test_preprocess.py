"""Device-side preprocessing vs torchvision semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from gavit_tpu.ops.preprocess import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    color_jitter,
    normalize,
    random_affine,
    train_preprocess,
    val_preprocess,
)


def _images(b=2, s=16, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (b, s, s, 3), np.uint8)


def test_val_preprocess_matches_torchvision_semantics():
    """ToTensor (/255) + Normalize(ImageNet), per reference
    ``transforms.py:34-44`` — expected values computed independently."""
    u8 = _images()
    ours = np.asarray(val_preprocess(jnp.asarray(u8)))
    expected = (u8.astype(np.float64) / 255.0 - np.asarray(IMAGENET_MEAN)) / (
        np.asarray(IMAGENET_STD)
    )
    np.testing.assert_allclose(ours, expected, atol=1e-6)


def test_normalize_inverts():
    x = jnp.asarray(np.random.default_rng(0).random((1, 8, 8, 3)),
                    jnp.float32)
    y = np.asarray(normalize(x))
    back = y * np.asarray(IMAGENET_STD) + np.asarray(IMAGENET_MEAN)
    np.testing.assert_allclose(back, np.asarray(x), atol=1e-6)


def test_affine_identity_when_params_trivial():
    x = jnp.asarray(_images(), jnp.float32) / 255.0
    out = random_affine(x, jax.random.key(0), degrees=0.0, translate=0.0,
                        scale_range=(1.0, 1.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_affine_translation_moves_content():
    x = np.zeros((1, 16, 16, 3), np.float32)
    x[0, 8, 8, :] = 1.0
    # fixed large translate: sample is U(-t, t); use many keys to see movement
    out = random_affine(jnp.asarray(x), jax.random.key(3), degrees=0.0,
                        translate=0.4, scale_range=(1.0, 1.0))
    out = np.asarray(out)
    assert out.sum() > 0  # content preserved (bilinear mass)
    assert not np.allclose(out, x)  # moved


def test_color_jitter_bounds_and_determinism():
    x = jnp.asarray(_images(), jnp.float32) / 255.0
    out1 = np.asarray(color_jitter(x, jax.random.key(1)))
    out2 = np.asarray(color_jitter(x, jax.random.key(1)))
    np.testing.assert_array_equal(out1, out2)
    assert out1.min() >= 0.0 and out1.max() <= 1.0


def test_train_preprocess_shapes_and_stats():
    u8 = _images(b=4, s=32)
    out = np.asarray(train_preprocess(jnp.asarray(u8), jax.random.key(0)))
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(out).all()
    # normalized range: roughly within (0-mean)/std .. (1-mean)/std
    assert out.min() >= -3.0 and out.max() <= 3.0


def test_train_preprocess_differs_per_rng():
    u8 = _images(b=4, s=32)
    a = np.asarray(train_preprocess(jnp.asarray(u8), jax.random.key(0)))
    b = np.asarray(train_preprocess(jnp.asarray(u8), jax.random.key(1)))
    assert not np.allclose(a, b)


def test_chestxray_transforms_factory_api():
    """Reference-compatible ChestXrayTransforms factory surface."""
    import jax

    from gavit_tpu.data.transforms import ChestXrayTransforms

    u8 = _images(b=2, s=16)
    val_fn = ChestXrayTransforms.get_val_transforms({"data": {"image_size": 16}})
    out = np.asarray(val_fn(u8))
    np.testing.assert_allclose(out, np.asarray(val_preprocess(u8)), atol=1e-6)

    train_fn = ChestXrayTransforms.get_train_transforms()
    out_t = np.asarray(train_fn(u8, jax.random.key(0)))
    assert out_t.shape == out.shape and np.isfinite(out_t).all()

    simple_fn = ChestXrayTransforms.get_train_transforms_simple()
    out_s = np.asarray(simple_fn(u8, jax.random.key(0)))
    assert np.isfinite(out_s).all()
