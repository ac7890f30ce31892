"""Transform-factory API compatible with the reference's
``ChestXrayTransforms`` (``/root/reference/src/data/transforms.py:8-44``).

The reference returns torchvision Compose pipelines that run per-image in
DataLoader workers; here the factories return **jittable batch functions**
over uint8 NHWC arrays that execute on device as one fused XLA graph
(``gavit_tpu/ops/preprocess.py``) — same semantics (resize happens at load
time in the dataset; flip/affine/jitter/normalize here), TPU-native
execution.
"""

from __future__ import annotations

import functools

import jax

from gavit_tpu.ops.preprocess import train_preprocess, val_preprocess


def _cfg_get(config, section, key, default=None):
    if config is None:
        return default
    if isinstance(config, dict):
        return config.get(section, {}).get(key, default)
    return getattr(getattr(config, section), key, default)


class ChestXrayTransforms:
    """Factories mirroring the reference class (train: flip + affine +
    colour-jitter + normalize; val: normalize only)."""

    @staticmethod
    def get_train_transforms(config=None):
        """Returns fn(images_u8 [B,S,S,3], rng) → normalized fp32 batch.

        Includes the RandomAffine of the reference's transform stack
        (``transforms.py:17-22``); note the reference's own training entry
        point uses a simpler flip+jitter stack (``scripts/train.py:29-47``)
        — that variant is ``get_train_transforms_simple``.
        """
        del config

        @jax.jit
        def fn(images_u8, rng):
            return train_preprocess(images_u8, rng, use_affine=True)

        return fn

    @staticmethod
    def get_train_transforms_simple(config=None):
        del config

        @jax.jit
        def fn(images_u8, rng):
            return train_preprocess(images_u8, rng, use_affine=False)

        return fn

    @staticmethod
    def get_val_transforms(config=None):
        del config
        return jax.jit(functools.partial(val_preprocess))
