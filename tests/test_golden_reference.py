"""Golden-logit parity against the ACTUAL reference module.

Unlike tests/test_parity.py (which uses a fresh re-implementation of the
reference forward math), these tests import ``/root/reference/src/models/vit.py``
itself — the self-contained torch+einops VisionTransformer — construct it at
full ViT-B/16 depth-12 with ``qkv_bias=True`` per
``/root/reference/configs/baseline_config.yaml:28``, and gate the Flax model
at |Δlogit| ≤ 1e-3 (fp32, the BASELINE.json north-star bar).

A transcription error in tests/torch_ref.py would previously have been
invisible; ``test_torch_ref_matches_reference`` now pins the re-implementation
to the real file as well.
"""

from __future__ import annotations

import importlib.util
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from gavit_tpu.config import from_dict
from gavit_tpu.models.vit import build_model
from gavit_tpu.utils.torch_convert import torch_state_dict_to_params

REFERENCE_VIT = pathlib.Path("/root/reference/src/models/vit.py")

pytestmark = pytest.mark.skipif(
    not REFERENCE_VIT.exists(),
    reason="reference checkout not present on this machine",
)

TOL = 1e-3


@pytest.fixture(scope="module")
def reference_vit_module():
    spec = importlib.util.spec_from_file_location(
        "reference_vit_golden", REFERENCE_VIT
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _golden_logits(ref_model, img_size, batch=2, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((batch, 3, img_size, img_size)).astype(np.float32)
    with torch.no_grad():
        t_logits = ref_model(torch.from_numpy(x)).numpy()
    return x, t_logits


def _flax_logits(sd, depth, model_raw, x):
    params = torch_state_dict_to_params(
        {k: v.numpy() for k, v in sd.items()}, depth=depth
    )
    cfg = from_dict({"model": model_raw})
    # attn_impl='xla' keeps full-depth CPU runtime sane; kernel==xla parity is
    # gated separately (tests/test_ops_attention.py, test_parity.py).
    jmodel = build_model(cfg.model, precision="fp32", attn_impl="xla")
    return np.asarray(
        jmodel.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     deterministic=True)
    )


@pytest.mark.parametrize("img_size", [224, 384])
def test_vit_b16_full_depth_golden_parity(reference_vit_module, img_size):
    """Full ViT-B/16 (768d x 12L x 12H) vs /root/reference/src/models/vit.py:122-224
    at 224px (N=197) and 384px (N=577, the ragged-N path)."""
    torch.manual_seed(0)
    ref = reference_vit_module.VisionTransformer(
        img_size=img_size, patch_size=16, num_classes=14,
        embed_dim=768, depth=12, num_heads=12, qkv_bias=True,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
    ).eval()
    x, t_logits = _golden_logits(ref, img_size)
    # guard against a degenerate (all-≈0) golden output masking real drift
    assert np.abs(t_logits).max() > 1e-3

    j_logits = _flax_logits(
        ref.state_dict(), 12,
        {"name": "custom", "img_size": img_size, "patch_size": 16,
         "embed_dim": 768, "depth": 12, "num_heads": 12, "num_classes": 14,
         "drop_rate": 0.0},
        x,
    )
    err = np.abs(t_logits - j_logits).max()
    assert err <= TOL, f"max |Δlogit| vs real reference = {err}"


def test_torch_ref_matches_reference(reference_vit_module):
    """Pin tests/torch_ref.py's re-implementation to the real reference file:
    load the reference's state_dict into TorchRefViT and require exact-level
    logit agreement."""
    from tests.torch_ref import TorchRefViT

    torch.manual_seed(1)
    ref = reference_vit_module.VisionTransformer(
        img_size=64, patch_size=16, num_classes=14,
        embed_dim=192, depth=2, num_heads=3, qkv_bias=True,
        drop_rate=0.0, attn_drop_rate=0.0, drop_path_rate=0.0,
    ).eval()

    mine = TorchRefViT(img_size=64, patch_size=16, embed_dim=192, depth=2,
                       num_heads=3).eval()
    # inverse of tests.torch_ref.reference_state_dict's remap
    remapped = {}
    for key, val in ref.state_dict().items():
        remapped[key.replace(".attn.", ".").replace(".mlp.", ".")] = val
    missing, unexpected = mine.load_state_dict(remapped, strict=True), None
    del missing, unexpected

    x, t_logits = _golden_logits(ref, 64, seed=2)
    with torch.no_grad():
        m_logits = mine(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(m_logits, t_logits, atol=1e-5)
