"""MAE pretraining (models/mae.py): masking invariants, masked-only loss,
optimisation sanity, and the export contract into the reference's
MAE-checkpoint format (the artifact the supervised recipe starts from —
reference configs/baseline_config.yaml:23, vit.py:182-200)."""

import os
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from gavit_tpu.config import from_dict
from gavit_tpu.models.mae import (
    MAEViT,
    encoder_params,
    export_reference_pth,
    mae_loss,
    patchify,
    random_masking,
)

CFG = from_dict({
    "model": {"name": "custom", "img_size": 32, "patch_size": 8,
              "embed_dim": 64, "depth": 2, "num_heads": 2,
              "num_classes": 14},
}).model


def _model(**kw):
    return MAEViT(cfg=CFG, decoder_dim=64, decoder_depth=1,
                  decoder_heads=2, **kw)


def test_random_masking_invariants():
    x = jax.random.normal(jax.random.key(0), (3, 16, 8))
    noise = jax.random.uniform(jax.random.key(1), (3, 16))
    x_vis, mask, ids_restore = random_masking(x, noise, n_keep=4)
    assert x_vis.shape == (3, 4, 8)
    # exactly N - n_keep masked per row
    np.testing.assert_array_equal(np.asarray(mask.sum(1)), 12.0)
    # the visible tokens are exactly the unmasked ones
    ids_shuffle = np.argsort(np.asarray(noise), axis=1)
    for b in range(3):
        np.testing.assert_array_equal(
            np.asarray(x_vis[b]), np.asarray(x[b])[ids_shuffle[b, :4]])
        np.testing.assert_array_equal(
            np.asarray(mask[b])[ids_shuffle[b, :4]], 0.0)
    # ids_restore inverts ids_shuffle
    np.testing.assert_array_equal(
        np.take_along_axis(ids_shuffle, np.asarray(ids_restore), axis=1),
        np.arange(16)[None].repeat(3, 0))


def test_forward_shapes_and_masked_only_loss():
    model = _model(mask_ratio=0.75)
    imgs = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    noise = jax.random.uniform(jax.random.key(1), (2, 16))
    params = model.init({"params": jax.random.key(2)}, imgs, noise)["params"]
    pred, mask = model.apply({"params": params}, imgs, noise)
    assert pred.shape == (2, 16, 8 * 8 * 3)
    assert mask.shape == (2, 16)
    loss = mae_loss(pred, imgs, mask, 8)
    assert np.isfinite(float(loss))
    # perturbing predictions on VISIBLE patches must not change the loss
    bad = pred + 100.0 * (1.0 - mask)[..., None]
    np.testing.assert_allclose(
        float(mae_loss(bad, imgs, mask, 8)), float(loss), rtol=1e-5)
    # perturbing a MASKED patch must
    bad2 = pred + 100.0 * mask[..., None]
    assert float(mae_loss(bad2, imgs, mask, 8)) > float(loss) + 1.0


def test_patchify_matches_patch_embed_ordering():
    """patchify's per-patch feature order == PatchEmbed's GEMM rows, so
    the reconstruction target and the encoder see the same layout."""
    from gavit_tpu.models.layers import PatchEmbed

    imgs = jax.random.normal(jax.random.key(0), (1, 16, 16, 3))
    pe = PatchEmbed(patch_size=8, embed_dim=5)
    params = pe.init(jax.random.key(1), imgs)["params"]
    k, b = params["proj"]["kernel"], params["proj"]["bias"]
    expected = patchify(imgs, 8) @ k + b
    np.testing.assert_allclose(
        np.asarray(pe.apply({"params": params}, imgs)),
        np.asarray(expected), atol=1e-5)


def test_mae_training_reduces_loss():
    import optax

    model = _model(mask_ratio=0.5)
    rng = jax.random.key(0)
    # structured images (smooth waves, random phase): masked patches are
    # predictable from context — pure noise would have an irreducible floor
    yy, xx = jnp.mgrid[0:32, 0:32] / 32.0
    phase = jax.random.uniform(rng, (8, 1, 1, 3)) * 6.28
    freq = jnp.asarray([1.0, 2.0, 3.0])
    imgs = jnp.sin(6.28 * freq * (xx + yy)[None, ..., None] + phase)
    params = model.init({"params": rng}, imgs,
                        jnp.zeros((8, 16)))["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        noise = jax.random.uniform(key, (8, 16))

        def loss_fn(p):
            pred, mask = model.apply({"params": p}, imgs, noise)
            return mae_loss(pred, imgs, mask, 8)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    first = None
    for i in range(100):
        params, opt, loss = step(params, opt, jax.random.fold_in(rng, i))
        first = first if first is not None else float(loss)
    # probed: 1.02 -> 0.19 at step 100 (adam 3e-3); generous margin
    assert float(loss) < 0.4 * first, (first, float(loss))


def test_export_reference_pth_loads_into_supervised_model(tmp_path):
    """The exported .pth round-trips through load_mae_weights: every
    encoder weight lands in the supervised ViT exactly; head stays fresh."""
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.utils.torch_convert import load_mae_weights

    model = _model()
    imgs = jnp.zeros((1, 32, 32, 3))
    mae_params = model.init({"params": jax.random.key(0)}, imgs,
                            jnp.zeros((1, 16)))["params"]
    path = str(tmp_path / "mae.pth")
    export_reference_pth(jax.device_get(mae_params), path,
                         patch_size=8, in_chans=3)
    assert os.path.exists(path)

    sup = build_model(CFG, precision="fp32")
    params = init_params(sup, jax.random.key(1))
    head_before = np.asarray(params["head"]["kernel"])
    loaded = load_mae_weights(params, path, depth=CFG.depth)

    enc = encoder_params(mae_params)
    np.testing.assert_allclose(
        np.asarray(loaded["blocks_0"]["attn"]["qkv"]["kernel"]),
        np.asarray(enc["blocks_0"]["attn"]["qkv"]["kernel"]), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(loaded["patch_embed"]["proj"]["kernel"]),
        np.asarray(enc["patch_embed"]["proj"]["kernel"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded["cls_token"]),
                               np.asarray(enc["cls_token"]), atol=1e-6)
    # decoder never leaks; head keeps its fresh init
    np.testing.assert_array_equal(
        np.asarray(loaded["head"]["kernel"]), head_before)
    assert "decoder_blocks_0" not in loaded


def test_mae_step_dp_mesh_matches_single_device():
    """The pretrain step under a data mesh reproduces single-device math
    (the CLI shards its batch over config mesh.data)."""
    from gavit_tpu.config import MeshConfig
    from gavit_tpu.parallel.mesh import make_mesh, shard_batch

    model = _model(mask_ratio=0.5)
    rng = jax.random.key(0)
    imgs = jax.random.normal(rng, (8, 32, 32, 3))
    noise = jax.random.uniform(jax.random.key(1), (8, 16))
    params = model.init({"params": rng}, imgs, noise)["params"]

    def loss_and_grads(p, x):
        def lf(p):
            pred, mask = model.apply({"params": p}, x, noise)
            return mae_loss(pred, x, mask, 8)

        return jax.value_and_grad(lf)(p)

    ref_loss, ref_grads = jax.jit(loss_and_grads)(params, imgs)

    mesh = make_mesh(MeshConfig(data=8, model=1))
    sharded = shard_batch(mesh, np.asarray(imgs))
    loss, grads = jax.jit(loss_and_grads)(params, sharded)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(grads), jax.tree.leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pretrain_cli_to_finetune_chain(tmp_path):
    """The CLI seam: pretrain_mae.py -> reference-layout .pth ->
    train.py --set model.pretrained_path picks it up."""
    import subprocess

    import yaml

    cfg = {
        "model": {"name": "custom", "img_size": 32, "patch_size": 8,
                  "embed_dim": 32, "depth": 1, "num_heads": 2,
                  "num_classes": 14},
        "data": {"image_size": 32, "batch_size": 16},
        "training": {"epochs": 1, "warmup_epochs": 1, "precision": "fp32",
                     "learning_rate": 1e-3},
        "paths": {"save_dir": str(tmp_path / "ckpt"),
                  "log_dir": str(tmp_path / "logs")},
    }
    cfg_path = tmp_path / "tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    root = Path(__file__).resolve().parent.parent
    env = dict(os.environ, GAVIT_PLATFORM="cpu")
    pth = tmp_path / "mae.pth"
    r = subprocess.run(
        [sys.executable, "scripts/pretrain_mae.py", "--config",
         str(cfg_path), "--synthetic", "--out", str(pth),
         "--decoder-dim", "32", "--decoder-depth", "1",
         "--decoder-heads", "2",
         "--set", "data.synthetic_size=64"],
        cwd=str(root), env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert pth.exists()
    r = subprocess.run(
        [sys.executable, "scripts/train.py", "--config", str(cfg_path),
         "--synthetic", "--set", f"model.pretrained_path={pth}",
         "--set", "data.synthetic_size=64"],
        cwd=str(root), env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Loaded MAE pre-trained weights" in r.stderr + r.stdout
