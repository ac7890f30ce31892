"""Tensor parallelism as a config change: TP-sharded params under jit must
reproduce single-device logits exactly (GSPMD distributes the matmuls and
inserts the collectives)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gavit_tpu.config import MeshConfig, from_dict
from gavit_tpu.models.vit import build_model, init_params
from gavit_tpu.parallel.mesh import make_mesh
from gavit_tpu.parallel.tp import model_param_specs, shard_model_params


def _setup():
    cfg = from_dict({"model": {
        "name": "custom", "img_size": 16, "patch_size": 8, "embed_dim": 32,
        "depth": 2, "num_heads": 4, "num_classes": 14, "drop_rate": 0.0,
        "graph": {"enabled": True, "num_blocks": 1, "adjacency": "knn",
                  "k": 2},
    }})
    # the Pallas kernel is opaque to GSPMD; TP uses the XLA attention path
    model = build_model(cfg.model, precision="fp32", attn_impl="xla")
    params = init_params(model, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (8, 16, 16, 3))
    return model, params, x


def test_specs_shapes():
    _, params, _ = _setup()
    specs = model_param_specs(params)
    assert specs["blocks_0"]["attn"]["qkv"]["kernel"] == P(None, "model")
    assert specs["blocks_0"]["attn"]["qkv"]["bias"] == P("model")
    assert specs["blocks_0"]["attn"]["proj"]["kernel"] == P("model", None)
    assert specs["blocks_0"]["attn"]["proj"]["bias"] == P()
    assert specs["blocks_0"]["mlp"]["fc1"]["kernel"] == P(None, "model")
    assert specs["blocks_0"]["mlp"]["fc2"]["kernel"] == P("model", None)
    assert specs["pos_embed"] == P()
    assert specs["head"]["kernel"] == P()


def test_tp_matches_single_device():
    model, params, x = _setup()
    ref = np.asarray(model.apply({"params": params}, x, deterministic=True))

    mesh = make_mesh(MeshConfig(data=2, model=4))
    assert mesh.devices.shape == (2, 4)
    tp_params = shard_model_params(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def fwd(p, x):
        return model.apply({"params": p}, x, deterministic=True)

    out = np.asarray(fwd(tp_params, xs))
    np.testing.assert_allclose(out, ref, atol=2e-5)
    # kernels are actually distributed (one shard holds 1/4 of the features)
    qkv = tp_params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.addressable_shards[0].data.shape[1] == qkv.shape[1] // 4


def test_tp_gradients_match():
    model, params, x = _setup()

    def loss(p, x):
        return jnp.sum(model.apply({"params": p}, x, deterministic=True) ** 2)

    g_ref = jax.grad(loss)(params, x)
    mesh = make_mesh(MeshConfig(data=2, model=4))
    tp_params = shard_model_params(params, mesh)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    g_tp = jax.jit(jax.grad(loss))(tp_params, xs)
    np.testing.assert_allclose(
        np.asarray(g_tp["blocks_0"]["mlp"]["fc1"]["kernel"]),
        np.asarray(g_ref["blocks_0"]["mlp"]["fc1"]["kernel"]),
        atol=2e-4,
    )
