"""Device-side image preprocessing as a single fused XLA graph.

The reference runs torchvision PIL transforms in DataLoader worker processes
(``/root/reference/src/data/transforms.py:8-44``, ``scripts/train.py:29-47``):
Resize → RandomHorizontalFlip(0.5) → RandomAffine(±5°, ±5% translate,
0.95–1.05 scale, zero fill) → ColorJitter(brightness 0.2, contrast 0.2) →
ToTensor → Normalize(ImageNet).

TPU-native redesign: the host only decodes + resizes to the static training
resolution and ships **uint8** NHWC batches (4× fewer H2D bytes than fp32);
everything stochastic and arithmetic — flip, affine warp, colour jitter,
normalisation — runs on device inside the jitted train step, so XLA fuses it
with the patchify GEMM and it overlaps with the previous step's compute.

Augmentation semantics match torchvision: per-sample Bernoulli(0.5) flip;
affine sampled as angle~U(-5°,5°), translate~U(-0.05,0.05)·size,
scale~U(0.95,1.05) about the image centre with bilinear resampling and zero
fill; brightness/contrast factors U(0.8,1.2) with [0,1] clamping (contrast
blends against the mean of the grayscale image, as torchvision does).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# grayscale weights used by torchvision's contrast adjustment
_GRAY = (0.299, 0.587, 0.114)


def normalize(x):
    """ImageNet normalisation on [B, H, W, 3] floats in [0, 1]."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def to_float(images_u8):
    return images_u8.astype(jnp.float32) / 255.0


def val_preprocess(images_u8):
    """ToTensor + Normalize (reference ``transforms.py:34-44``)."""
    return normalize(to_float(images_u8))


def _affine_one(img, angle, tx, ty, scale):
    """Inverse-map bilinear affine warp of one [H, W, C] image, zero fill."""
    h, w, c = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    x0 = xx - cx - tx
    y0 = yy - cy - ty
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    xi = (cos * x0 + sin * y0) / scale + cx
    yi = (-sin * x0 + cos * y0) / scale + cy
    coords = jnp.stack([yi.ravel(), xi.ravel()])

    def per_channel(ch):
        return jax.scipy.ndimage.map_coordinates(
            ch, coords, order=1, mode="constant", cval=0.0
        ).reshape(h, w)

    return jax.vmap(per_channel, in_axes=2, out_axes=2)(img)


def random_affine(x, rng, degrees=5.0, translate=0.05, scale_range=(0.95, 1.05)):
    """Per-sample random affine on [B, H, W, C] floats."""
    b, h, w, _ = x.shape
    ka, kt, ks = jax.random.split(rng, 3)
    angle = jax.random.uniform(
        ka, (b,), minval=-degrees, maxval=degrees
    ) * (jnp.pi / 180.0)
    trans = jax.random.uniform(kt, (b, 2), minval=-translate, maxval=translate)
    tx, ty = trans[:, 0] * w, trans[:, 1] * h
    scale = jax.random.uniform(
        ks, (b,), minval=scale_range[0], maxval=scale_range[1]
    )
    return jax.vmap(_affine_one)(x, angle, tx, ty, scale)


def color_jitter(x, rng, brightness=0.2, contrast=0.2):
    """Per-sample brightness/contrast jitter with [0,1] clamping."""
    b = x.shape[0]
    kb, kc = jax.random.split(rng)
    bf = jax.random.uniform(
        kb, (b, 1, 1, 1), minval=1.0 - brightness, maxval=1.0 + brightness
    )
    x = jnp.clip(x * bf, 0.0, 1.0)
    cf = jax.random.uniform(
        kc, (b, 1, 1, 1), minval=1.0 - contrast, maxval=1.0 + contrast
    )
    gray = jnp.einsum("bhwc,c->b", x, jnp.asarray(_GRAY, x.dtype)) / (
        x.shape[1] * x.shape[2]
    )
    mean = gray.reshape(b, 1, 1, 1)
    x = jnp.clip(cf * x + (1.0 - cf) * mean, 0.0, 1.0)
    return x


@functools.partial(jax.jit, static_argnames=("use_affine",))
def train_preprocess(images_u8, rng, use_affine: bool = True):
    """Full stochastic train-time pipeline on device.

    ``use_affine=False`` reproduces the simpler transform the reference's
    ``scripts/train.py:29-47`` actually trains with (flip + jitter only);
    True adds the RandomAffine of ``src/data/transforms.py:17-22``.
    """
    kf, ka, kj = jax.random.split(rng, 3)
    x = to_float(images_u8)
    flip = jax.random.bernoulli(kf, 0.5, (x.shape[0], 1, 1, 1))
    x = jnp.where(flip, x[:, :, ::-1, :], x)
    if use_affine:
        x = random_affine(x, ka)
    x = color_jitter(x, kj)
    return normalize(x)
