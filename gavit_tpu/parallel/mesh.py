"""Device mesh + sharding rules for data-parallel training over ICI.

The reference is strictly single-device (``scripts/train.py:133``, no
torch.distributed anywhere — SURVEY.md §2.6); this module is the TPU-native
scaling layer: a ``('data', 'model')`` mesh over the chips of a slice (v5e-8:
8 chips on ICI), batches sharded along ``data``, parameters/optimizer state
replicated. Gradient averaging is inserted automatically by the partitioner
as ``psum`` over ICI when the jitted train step consumes a data-sharded batch
and produces replicated parameter updates — no NCCL-style explicit
collectives in user code.

The ``model`` axis is reserved so tensor-parallel PartitionSpecs are a config
change, not a redesign (SURVEY.md §2.6); all current specs replicate over it.
For multi-host slices, per-host data feeding uses
``jax.make_array_from_process_local_data`` via :func:`shard_batch`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gavit_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    pipe = max(1, getattr(cfg, "pipe", 1)) if cfg else 1
    model = max(1, cfg.model) if cfg else 1
    if pipe > 1:
        # pipeline parallelism is a ('pipe', 'data') mesh (parallel/pp.py);
        # tp/fsdp/sp don't compose with the stacked-layer GPipe trunk
        if model > 1 or (cfg and (cfg.fsdp or cfg.sp)):
            raise ValueError(
                "mesh.pipe > 1 composes with data parallelism only — set "
                "model=1, fsdp=false, sp=false (the GPipe trunk is a "
                "manual shard_map region; see parallel/pp.py scope)")
        data = cfg.data if (cfg.data and cfg.data > 0) else n // pipe
        if pipe * data > n:
            raise ValueError(
                f"mesh pipe={pipe}x data={data} needs {pipe * data} "
                f"devices, have {n}")
        arr = np.asarray(devices[: pipe * data]).reshape(pipe, data)
        return Mesh(arr, ("pipe", "data"))
    data = cfg.data if (cfg and cfg.data and cfg.data > 0) else n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data*model} devices, have {n}")
    dev_array = mesh_utils.create_device_mesh(
        (data, model), devices=devices[: data * model]
    )
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dimension split along the data axis."""
    return NamedSharding(mesh, P("data"))


def stacked_batch_sharding(mesh: Mesh) -> NamedSharding:
    """[K, B, ...] multi-step stacks: batch dim (axis 1) split on data."""
    return NamedSharding(mesh, P(None, "data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded along the data axis.

    Single-process: a plain device_put with a NamedSharding. Multi-host: each
    process contributes its local shard of the global batch.

    The leading dimension must be divisible by the data-axis size; use
    :func:`shard_batch_padded` for loaders with ragged tail batches
    (``drop_last=False``).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def data_axis_size(mesh: Mesh) -> int:
    return mesh.shape.get("data", 1)


def shard_stacked_batch(mesh: Mesh, batch):
    """Place a [K, B, ...] multi-step stack: batch dim (axis 1) on 'data'.

    Multi-host: each process contributes its local [K, local_B, ...] shard —
    a bare device_put would treat the local stack as the whole global value
    and silently train on half-size inconsistent batches.
    """
    sharding = stacked_batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )


def pad_batch(batch, multiple: int):
    """Wrap-pad every leaf's leading dim up to a multiple of ``multiple``.

    Pad rows repeat real samples (index i % n), so every padded row is a
    valid input. Returns ``(padded_batch, n_real)``; note ``n_real`` is only
    a LOCAL prefix length — for global (multi-process) accounting use
    :func:`shard_batch_padded`'s ``valid`` mask, since pad rows interleave
    with real ones across process shards.
    """
    leaves = jax.tree.leaves(batch)
    n = leaves[0].shape[0]
    target = -(-n // multiple) * multiple
    if target == n:
        return batch, n
    idx = np.arange(target) % n
    return jax.tree.map(lambda x: np.asarray(x)[idx], batch), n


def data_feed_spec(mesh: Mesh) -> tuple[int, int, int]:
    """Per-process input-feeding spec ``(shard_index, num_shards, k)``.

    ``num_shards`` distinct data streams feed the mesh; this process feeds
    stream ``shard_index``; its local batches must have row counts divisible
    by ``k`` (the number of data-axis coordinates its devices span).

    Processes whose devices hold the SAME data-axis coordinates — the
    ``model`` axis crossing a process boundary, e.g. a (data=2, model=2)
    mesh over 4 single-device hosts, or pure-TP ``(1, n)`` over several
    hosts — form one feeding group: they land in the same stream and must
    supply identical local data (their devices hold replicas of the same
    batch rows, which ``jax.make_array_from_process_local_data`` requires).
    In the common aligned case (every process covers a distinct slice of the
    data axis) this degenerates to
    ``(process_index, process_count, data_axis / process_count)``.
    """
    if jax.process_count() == 1:
        return 0, 1, data_axis_size(mesh)
    coords: dict[int, set[int]] = {}
    # 'data' may be any mesh dimension (callers supply arbitrary axis
    # orders) — group by the data-axis coordinate, not dimension 0
    arr = np.moveaxis(
        mesh.devices, mesh.axis_names.index("data"), 0
    )
    for di in range(arr.shape[0]):
        for dev in arr[di].ravel():
            coords.setdefault(dev.process_index, set()).add(di)
    pi = jax.process_index()
    if pi not in coords:
        raise ValueError(
            f"process {pi} has no devices in mesh {mesh}; every feeding "
            "process must own part of the mesh"
        )
    tuples = {p: tuple(sorted(c)) for p, c in coords.items()}
    unique = sorted(set(tuples.values()))
    if len({len(u) for u in unique}) != 1 or any(
        u[-1] - u[0] + 1 != len(u) for u in unique
    ):
        raise ValueError(
            "unsupported process→data-coordinate layout (groups must cover "
            f"equal contiguous data-axis slices): {unique}"
        )
    return unique.index(tuples[pi]), len(unique), len(tuples[pi])


def shard_batch_padded(mesh: Mesh, batch):
    """:func:`shard_batch` tolerant of ragged tail batches: wrap-pads the
    leading dim so every data-axis coordinate gets equal rows. Returns
    ``(sharded_batch, valid)`` where ``valid`` is a host-side boolean mask
    over GLOBAL rows marking the genuine ones.

    A mask (not a count): the global batch concatenates each feeding
    group's padded local shard, so with >1 group the pad rows are
    interleaved ``[g0 real.., g0 pad, g1 real.., g1 pad]`` — a prefix slice
    ``[:n_real]`` would keep group 0's duplicates and drop group 1's real
    tail. Every group feeds an equal local shard, so the mask is the local
    pattern tiled ``num_shards`` times and identical on every host.
    """
    _, num_shards, k = data_feed_spec(mesh)
    batch, n_local = pad_batch(batch, max(1, k))
    padded_rows = jax.tree.leaves(batch)[0].shape[0]
    local_valid = np.arange(padded_rows) < n_local
    return shard_batch(mesh, batch), np.tile(local_valid, num_shards)
