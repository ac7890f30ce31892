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
``psum`` anywhere. The fused Pallas attention kernel is opaque to GSPMD, so
TP runs use ``attn_impl='xla'`` (or 'reference'); the Pallas path is the
DP-only fast path. Correctness (TP math == single-device math) is pinned by
``tests/test_tensor_parallel.py`` on the virtual 8-device mesh.
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
        del joined, leaf
        return P()  # replicated

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_model_params(params, mesh: Mesh):
    """Place a param tree on the mesh with the TP partition specs."""
    specs = model_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def train_state_shardings(mesh: Mesh, tx, state):
    """NamedSharding pytree for a full TrainState under tensor parallelism.

    ``state.params`` is the Trainer's two-group tree ``{'model': ...,
    'criterion': ...}``: the model group gets the Megatron specs above, the
    criterion λs (and the step counter) stay replicated. The optimizer-state
    shardings are not spelled out by hand — ``tx.init`` is run once under
    ``jit`` on TP-sharded abstract params — AOT lowering only, nothing is
    allocated — and GSPMD's propagation gives every moment buffer its
    param's sharding (scalars like the schedule count come back replicated).
    That keeps this function correct for any optax chain.
    """
    repl = NamedSharding(mesh, P())
    is_spec = lambda s: isinstance(s, P)
    param_specs = {
        "model": model_param_specs(state.params["model"]),
        "criterion": jax.tree.map(lambda _: P(), state.params["criterion"]),
    }
    param_sh = jax.tree.map(
        lambda s: NamedSharding(mesh, s), param_specs, is_leaf=is_spec
    )
    abstract = jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x),
                                          sharding=s),
        state.params, param_sh,
    )
    ref_opt_sh = jax.jit(tx.init).lower(abstract).compile().output_shardings

    def norm(path, x, s):
        # input-independent leaves (schedule counts, zeros) come back with a
        # single-device default sharding — those are replicated state. Mesh
        # identity is axis names + device list, not just shape: a different
        # mesh of the same shape must not be treated as ours.
        ok = (
            isinstance(s, NamedSharding)
            and tuple(s.mesh.axis_names) == tuple(mesh.axis_names)
            and s.mesh.devices.tolist() == mesh.devices.tolist()
        )
        if not ok and jnp.ndim(x) > 0 and isinstance(s, NamedSharding):
            # a NamedSharding on some OTHER mesh means GSPMD propagated a
            # real (possibly sharded) layout we are about to discard — a
            # silent HBM regression under TP. (SingleDeviceSharding leaves
            # are the expected input-independent case: replicated state.)
            logger.warning(
                "optimizer-state leaf %s fell back to replicated "
                "(propagated sharding %r is not on the TP mesh)",
                jax.tree_util.keystr(path), s,
            )
        return s if ok else repl

    abstract_opt = jax.eval_shape(tx.init, abstract)
    opt_sh = jax.tree_util.tree_map_with_path(norm, abstract_opt, ref_opt_sh)
    return type(state)(step=repl, params=param_sh, opt_state=opt_sh)
