"""Tensor-parallel partition specs for the ViT parameter tree.

BASELINE.json requires only data parallelism; SURVEY §2.6 asks that the mesh
abstraction keep TP "a config change". This module is that change: Megatron-
style PartitionSpecs over the reserved ``model`` mesh axis —

  * column-parallel: qkv and MLP fc1 kernels split on their OUTPUT features,
  * row-parallel: attention proj and MLP fc2 kernels split on their INPUT
    features (GSPMD inserts the partial-sum reduction),
  * everything else (embeddings, LayerNorms, head, graph blocks, biases of
    row-parallel layers) replicated.

Placing parameters with these shardings under ``jit`` makes XLA's SPMD
partitioner distribute the matmuls and insert the collectives — no manual
``psum`` anywhere. The fused attention kernels stay in play under TP: their
partitioning rules declare the heads dim shardable
(``parallel/op_sharding.py::head_partitioned_cached``), so each chip runs
its local heads (v4's flat layout and the fused MLP megakernel are the
exceptions — their dispatches fall back to TP-safe forms automatically, see
``ops/attention.py`` / ``models/layers.py::Mlp``). The graph kernels remain
``graph_impl='xla'`` under TP. Correctness (TP math == single-device math,
pallas == xla) is pinned by ``tests/test_tensor_parallel.py`` on the
virtual 8-device mesh.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def model_param_specs(params) -> dict:
    """PartitionSpec pytree for a VisionTransformer param tree."""

    def spec_for(path, leaf):
        keys = [getattr(p, "key", str(p)) for p in path]
        name = keys[-1] if keys else ""
        joined = "/".join(keys)
        if "attn" in keys and "qkv" in keys:
            # column-parallel: [D, 3C] kernel, [3C] bias
            return P(None, "model") if name == "kernel" else P("model")
        if "attn" in keys and "proj" in keys and name == "kernel":
            return P("model", None)  # row-parallel; bias stays replicated
        if "mlp" in keys and "fc1" in keys:
            return P(None, "model") if name == "kernel" else P("model")
        if "mlp" in keys and "fc2" in keys and name == "kernel":
            return P("model", None)
        if "moe" in keys and name != "router":
            # expert parallelism: the expert bank's leading E dim shards
            # over the same reserved axis (fc{1,2}_kernel [E, ·, ·],
            # fc{1,2}_bias [E, ·]); the router stays replicated. The
            # dispatched activations are pinned by
            # models/moe.py::ep_shard_constraint, so GSPMD lowers the
            # dispatch/combine einsums as all-to-alls over ICI.
            return P(*(("model",) + (None,) * (jnp.ndim(leaf) - 1)))
        del joined, leaf
        return P()  # replicated

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_model_params(params, mesh: Mesh):
    """Place a param tree on the mesh with the TP partition specs."""
    specs = model_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def train_state_shardings(mesh: Mesh, tx, state, model_specs=None):
    """NamedSharding pytree for a full TrainState under tensor parallelism
    (and/or FSDP — pass ``model_specs`` to override the model group's
    PartitionSpecs, e.g. ``fsdp.fsdp_param_specs``).

    ``state.params`` is the Trainer's two-group tree ``{'model': ...,
    'criterion': ...}``: the model group gets the Megatron specs above, the
    criterion λs (and the step counter) stay replicated. Optimizer-state
    shardings come from STRUCTURAL matching: every optax moment tree (mu/nu
    in AdamW, trace in SGD, …) embeds the param tree whole, so an opt-state
    leaf's key path ends with some param leaf's full key path — that param's
    spec is the moment's spec. (AOT ``tx.init`` + GSPMD output-sharding
    propagation was tried first and does NOT propagate input shardings to
    the moments on this JAX version — it silently replicated every moment,
    a data-axis-fold HBM regression under FSDP.) Scalars (schedule counts)
    and unmatched leaves stay replicated.
    """
    del tx  # structure comes from state.opt_state itself
    repl = NamedSharding(mesh, P())
    is_spec = lambda s: isinstance(s, P)
    if model_specs is None:
        model_specs = model_param_specs(state.params["model"])
    param_specs = {
        "model": model_specs,
        "criterion": jax.tree.map(lambda _: P(), state.params["criterion"]),
    }
    param_sh = jax.tree.map(
        lambda s: NamedSharding(mesh, s), param_specs, is_leaf=is_spec
    )

    keyify = lambda path: tuple(str(p) for p in path)
    flat_params = jax.tree_util.tree_flatten_with_path(state.params)[0]
    spec_leaves = jax.tree.leaves(param_specs, is_leaf=is_spec)
    by_path = {
        keyify(p): (spec, jnp.shape(x))
        for (p, x), spec in zip(flat_params, spec_leaves)
    }

    def opt_spec(path, x):
        if jnp.ndim(x) == 0:
            return repl
        keys = keyify(path)
        for k in range(len(keys)):
            hit = by_path.get(keys[k:])
            if hit is not None and hit[1] == jnp.shape(x):
                return NamedSharding(mesh, hit[0])
        logger.warning(
            "optimizer-state leaf %s (shape %r) matched no parameter — "
            "keeping it replicated", jax.tree_util.keystr(path),
            jnp.shape(x),
        )
        return repl

    opt_sh = jax.tree_util.tree_map_with_path(opt_spec, state.opt_state)
    return type(state)(step=repl, params=param_sh, opt_state=opt_sh)
