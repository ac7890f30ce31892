"""Golden-logit parity vs the PyTorch reference semantics.

The BASELINE.json north star gates fp32 logits at ≤1e-3 against the reference
model. A fresh torch model with the reference's exact forward math
(tests/torch_ref.py) provides golden outputs; its weights are converted via
gavit_tpu.utils.torch_convert and the Flax model must reproduce the logits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from gavit_tpu.config import from_dict
from gavit_tpu.models.vit import build_model, init_params
from gavit_tpu.utils.torch_convert import (
    interpolate_pos_embed,
    torch_state_dict_to_params,
)
from tests.torch_ref import TorchRefViT, reference_state_dict

TOL = 1e-3


def _build_pair(img_size=64, patch_size=16, embed_dim=96, depth=3, num_heads=3,
                graph=None, seed=0):
    torch.manual_seed(seed)
    tmodel = TorchRefViT(
        img_size=img_size, patch_size=patch_size, embed_dim=embed_dim,
        depth=depth, num_heads=num_heads,
    ).eval()
    sd = reference_state_dict(tmodel)
    params = torch_state_dict_to_params(
        {k: v.numpy() for k, v in sd.items()}, depth=depth
    )

    model_raw = {
        "name": "custom", "img_size": img_size, "patch_size": patch_size,
        "embed_dim": embed_dim, "depth": depth, "num_heads": num_heads,
        "num_classes": 14, "drop_rate": 0.0,
    }
    if graph:
        model_raw["graph"] = graph
    cfg = from_dict({"model": model_raw})
    jmodel = build_model(cfg.model, precision="fp32")

    if graph:
        # fresh init for graph params, converted weights for the backbone;
        # gates init to 0 so the graph branch is an exact no-op at init
        fresh = init_params(jmodel, jax.random.key(seed))
        merged = dict(fresh)
        merged.update(params)
        params = merged
    return tmodel, jmodel, params


def _compare(tmodel, jmodel, params, img_size, batch=2, tol=TOL):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((batch, 3, img_size, img_size)).astype(np.float32)
    with torch.no_grad():
        t_logits = tmodel(torch.from_numpy(x)).numpy()
    j_logits = np.asarray(
        jmodel.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     deterministic=True)
    )
    err = np.abs(t_logits - j_logits).max()
    assert err <= tol, f"max |Δlogit| = {err}"
    return err


def test_vit_logit_parity():
    tmodel, jmodel, params = _build_pair()
    _compare(tmodel, jmodel, params, img_size=64)


def test_vit_parity_reference_attention_impl():
    """Parity independent of the attention kernel choice."""
    tmodel, jmodel, params = _build_pair()
    jmodel_ref = jmodel.clone(attn_impl="reference")
    _compare(tmodel, jmodel_ref, params, img_size=64)


def test_graph_model_parity_at_init():
    """With the gate init at 0, a graph-augmented model is logit-identical to
    the plain ViT — MAE/reference weights are preserved exactly."""
    graph = {"enabled": True, "num_blocks": 2, "adjacency": "knn", "k": 4}
    tmodel, jmodel, params = _build_pair(graph=graph)
    _compare(tmodel, jmodel, params, img_size=64)


def test_vit_base_sized_parity():
    """One block of real ViT-B/16 width at 224px (kept shallow for speed)."""
    tmodel, jmodel, params = _build_pair(
        img_size=224, patch_size=16, embed_dim=768, depth=1, num_heads=12
    )
    _compare(tmodel, jmodel, params, img_size=224)


def test_pos_embed_interpolation():
    pe = jnp.asarray(np.random.default_rng(0).standard_normal((1, 17, 8)),
                     jnp.float32)
    out = interpolate_pos_embed(pe, 64)  # 4x4 grid -> 8x8 grid
    assert out.shape == (1, 65, 8)
    np.testing.assert_allclose(out[:, 0], pe[:, 0])  # CLS untouched
    with pytest.raises(ValueError):
        interpolate_pos_embed(pe, 17)  # non-square target


def test_load_mae_weights_end_to_end(tmp_path):
    """MAE-style .pth loading: backbone adopted, head kept fresh, pos-embed
    interpolated across grid sizes (reference vit.py:182-200 +
    gradcam.py:457-464 semantics)."""
    torch.manual_seed(3)
    tmodel = TorchRefViT(img_size=64, patch_size=16, embed_dim=96, depth=2,
                         num_heads=3).eval()
    sd = reference_state_dict(tmodel)
    path = tmp_path / "mae.pth"
    torch.save({"model": sd}, path)

    from gavit_tpu.utils.torch_convert import load_mae_weights

    cfg = from_dict({"model": {
        "name": "custom", "img_size": 64, "patch_size": 16, "embed_dim": 96,
        "depth": 2, "num_heads": 3, "num_classes": 14, "drop_rate": 0.0,
    }})
    model = build_model(cfg.model, precision="fp32")
    fresh = init_params(model, jax.random.key(7))
    head_before = np.asarray(fresh["head"]["kernel"]).copy()
    loaded = load_mae_weights(fresh, str(path), depth=2)
    # backbone adopted
    np.testing.assert_allclose(
        np.asarray(loaded["blocks_0"]["mlp"]["fc1"]["kernel"]),
        sd["blocks.0.mlp.fc1.weight"].numpy().T, atol=1e-6)
    # head untouched (reference filters 'head' keys)
    np.testing.assert_array_equal(
        np.asarray(loaded["head"]["kernel"]), head_before)

    # grid-size mismatch: 64px ckpt -> 128px model interpolates pos_embed
    cfg128 = from_dict({"model": {
        "name": "custom", "img_size": 128, "patch_size": 16, "embed_dim": 96,
        "depth": 2, "num_heads": 3, "num_classes": 14,
    }})
    model128 = build_model(cfg128.model, precision="fp32")
    fresh128 = init_params(model128, jax.random.key(8))
    loaded128 = load_mae_weights(fresh128, str(path), depth=2)
    assert loaded128["pos_embed"].shape == (1, 65, 96)  # 8x8 grid + CLS
    logits = model128.apply(
        {"params": loaded128},
        jnp.zeros((1, 128, 128, 3)), deterministic=True)
    assert np.isfinite(np.asarray(logits)).all()


def test_remat_identical_outputs_and_grads():
    """model.remat=True must change only memory behavior: logits and grads
    bit-match the non-remat model (same params, same dropout rng)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gavit_tpu.config import from_dict
    from gavit_tpu.models.vit import build_model, init_params

    outs = {}
    for remat in (False, True):
        cfg = from_dict({"model": {
            "name": "custom", "img_size": 16, "patch_size": 8,
            "embed_dim": 32, "depth": 2, "num_heads": 2, "num_classes": 14,
            "drop_rate": 0.1, "remat": remat,
            "graph": {"enabled": True, "num_blocks": 1,
                      "adjacency": "knn", "k": 2},
        }})
        model = build_model(cfg.model, precision="fp32")
        params = init_params(model, jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 3))

        def loss(p):
            out = model.apply(
                {"params": p}, x, deterministic=False,
                rngs={"dropout": jax.random.key(7)},
            )
            return jnp.sum(out ** 2)

        outs[remat] = (float(loss(params)), jax.grad(loss)(params))

    v0, g0 = outs[False]
    v1, g1 = outs[True]
    np.testing.assert_allclose(v1, v0, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
