"""ZeRO-3-style fully-sharded data parallelism (FSDP) partition specs.

The reference is single-device (``/root/reference/scripts/train.py:133``);
plain data parallelism replicates every parameter and both Adam moments on
every chip, so the per-chip state memory is ``(4 + 4 + 4) bytes x params``
regardless of chip count — at ViT-L (308M params) that is ~3.7 GB of a v5e's
16 GB HBM before a single activation. FSDP shards that state over the
'data' mesh axis instead: each chip owns ``1/data`` of every large leaf, the
XLA SPMD partitioner all-gathers a parameter right before its op consumes it
(and frees the gathered copy after — the gather rides ICI and overlaps the
preceding layer's compute), and gradients come back reduce-scattered so the
optimizer update itself runs sharded. No manual collectives anywhere: these
are just ``PartitionSpec`` annotations, the partitioner does the rest (the
"How to Scale Your Model" FSDP recipe).

Composes with tensor parallelism: a leaf already sharded over 'model'
(Megatron specs, ``parallel/tp.py``) gets 'data' on one of its remaining
divisible dims — e.g. the qkv kernel [D, 3C] goes ``P(None, 'model')`` →
``P('data', 'model')``.

Enable with ``mesh.fsdp: true`` in the YAML config (or
``--set mesh.fsdp=true`` on any CLI).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, PartitionSpec as P


def _add_data_axis(spec: P, shape: tuple[int, ...], data: int,
                   min_size: int) -> P:
    """Insert 'data' on the largest free, divisible dim of ``shape``.

    Free = not already sharded by ``spec`` (e.g. TP's 'model' axis).
    Leaves with fewer than ``min_size`` elements — LayerNorm scales, biases,
    the cls token — stay as-is: all-gathering a sub-page leaf every step
    costs more latency than the replication costs memory.
    """
    if data <= 1 or int(np.prod(shape, dtype=np.int64)) < min_size:
        return spec
    entries = list(spec) + [None] * (len(shape) - len(spec))
    best = None
    for i, s in enumerate(shape):
        if entries[i] is not None:
            continue
        if s % data:
            continue
        if best is None or s > shape[best]:
            best = i
    if best is None:
        return spec
    entries[best] = "data"
    return P(*entries)


def fsdp_param_specs(params, mesh: Mesh, min_size: int = 4096,
                     base_specs=None):
    """PartitionSpec pytree sharding every large leaf over 'data'.

    ``base_specs`` (same tree structure, default all-replicated) carries any
    pre-existing sharding to compose with — pass
    ``tp.model_param_specs(params)`` for combined FSDP x TP.
    """
    data = mesh.shape.get("data", 1)
    if base_specs is None:
        base_specs = jax.tree.map(lambda _: P(), params)
    # params leads the traversal (its leaves are arrays), so the spec tree's
    # P entries are picked up whole at the matching positions
    return jax.tree.map(
        lambda leaf, spec: _add_data_axis(
            spec, tuple(getattr(leaf, "shape", np.shape(leaf))), data,
            min_size,
        ),
        params, base_specs,
    )
