"""SPMD partitioning rules for the fused Pallas ops (shard-local execution).

A ``pallas_call`` lowers to a Mosaic custom call that the XLA SPMD
partitioner knows nothing about, so under a ``jit`` over the device mesh it
falls back to *replicating* the op: the partitioner all-gathers the
batch-sharded operands and every chip computes the FULL global batch
(verified on the 8-device virtual mesh: the lowered HLO contains
``all-gather`` ops reassembling the [B, N, 3HD] qkv rows before the
attention kernel). That silently destroys data-parallel scaling — each chip
does data-size× the work and holds data-size× the activations.

:func:`batch_partitioned` fixes this at the op level: it wraps a
pallas-calling function in :class:`jax.experimental.custom_partitioning`
with the rule "the declared factor dims may stay sharded, everything else is
replicated", so GSPMD/Shardy runs the kernel shard-locally on each chip's
rows — the TPU-native equivalent of the reference's per-GPU kernel
launches, but derived from the sharding annotations instead of explicit
process code.

Three factors cover every fused op in this codebase:

* ``b`` — the batch dim (data parallelism). Declared with a plain int
  per-argument dim index.
* ``h`` — the attention heads dim (tensor parallelism): heads are
  embarrassingly parallel in MHSA, so under Megatron TP the v3/v5 kernels
  run on each chip's local heads. Declared with a ``{"b": i, "h": j}``
  dict entry. Factors may be sharded simultaneously (dp×tp meshes).
* ``f`` — a CONTRACTED feature dim (Megatron column/row parallelism): the
  fused-MLP hidden dim, sharded on fc1's output features and fc2's input
  features. Outputs that sum over it (the MLP's y) declare it in
  ``psum_outs`` and are partial-summed over the factor's mesh axes inside
  the partition body — the Megatron row-parallel reduction, derived from
  the sharding annotations.

Extras the fused ops need:

* **seed streams** — the dropout-family kernels derive per-program PRNG
  streams from ``seed + program_id``. Shard-locally every chip restarts
  program ids at 0, which would repeat identical masks across the batch
  shards; the wrapper offsets the seed by ``axis_index * local_stream_count``
  so every (chip, program) pair draws a distinct stream, and — because the
  forward and backward wrappers compute the same offset from the same local
  shapes — mask regeneration in the backward still matches exactly.
* **cross-shard reductions** — the fused MLP backward accumulates bias
  gradients over its row grid; each shard's partial sum is ``psum``'d over
  the batch axis inside the partitioned body (the partitioner would
  otherwise have no way to know the output is a reduction over the sharded
  dim).

The wrapper is a no-op structurally when nothing is sharded along a factor
dim (single device, or replicated operands): the partition body degenerates
to the original function.
"""

from __future__ import annotations

import functools
import string

import jax
import numpy as np
from jax import lax
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

_FACTORS = ("b", "h", "f")  # stable order: seed offsets / rule letters


def _norm(entry) -> dict:
    """Normalize a per-array factor declaration: int → {'b': dim}."""
    if entry is None:
        return {}
    if isinstance(entry, dict):
        return entry
    return {"b": entry}


def _sdy_rule(arg_ranks, arg_dims, out_ranks, out_dims):
    """Einsum-notation Shardy rule: one shared factor letter per declared
    factor on its dims, a unique factor everywhere else, all non-factor
    letters marked need-replication ("only declared dims may stay
    sharded"). A factor appearing on inputs but on no output (the ``f``
    contraction under psum, the ``b`` reduction of bias grads) is einsum
    contraction notation — exactly the partial-sum semantics the partition
    body implements."""
    names = iter(
        f"{a}{c}" for a in string.ascii_lowercase if a not in _FACTORS
        for c in string.ascii_lowercase
    )
    factors = []

    def dims(rank, fmap):
        by_dim = {d: f for f, d in fmap.items()}
        out = []
        for d in range(rank):
            if d in by_dim:
                out.append(by_dim[d])
            else:
                f = next(names)
                factors.append(f)
                out.append(f)
        return " ".join(out)

    lhs = ", ".join(dims(r, fm) for r, fm in zip(arg_ranks, arg_dims))
    rhs = ", ".join(dims(r, fm) for r, fm in zip(out_ranks, out_dims))
    return f"{lhs} -> {rhs}", tuple(factors)


def _spec(rank, fmap, axes_by_factor):
    entries = [None] * rank
    for f, d in fmap.items():
        axes = axes_by_factor.get(f)
        if axes:
            entries[d] = axes if len(axes) > 1 else axes[0]
    return P(*entries)


def batch_partitioned(fn, arg_batch, out_batch, *, seed_arg=None,
                      seed_stride=None, psum_outs=()):
    """Wrap ``fn(*arrays)`` to execute shard-locally along declared dims.

    Args:
      fn: positional-array function (close over static params first). Must
        return one array or a tuple of arrays.
      arg_batch: per-argument declaration — an int (batch-dim index), a
        dict ``{"b": i, "h": j}`` naming factor dims, or None for fully
        replicated operands (weights, seeds).
      out_batch: per-output declaration, same forms.
      seed_arg: index of an int32 seed argument to offset per shard.
      seed_stride: ``f(local_args) -> int`` — number of PRNG streams the
        kernel consumes on one shard (the per-shard grid size); the seed is
        offset by ``shard_linear_index * stride`` over every sharded factor
        axis.
      psum_outs: partial-sum outputs. A dict ``{out_index: factor_names}``
        psums that output over exactly those factors' mesh axes inside the
        partition body (its declared out dims stay sharded); the legacy
        tuple form ``(i, ...)`` means "over every factor axis". Declared
        out dims and psum factors must be disjoint per output.
    Returns:
      A function with ``fn``'s signature, safe to call under ``jit`` whether
      or not operands are sharded.
    """
    arg_dims = tuple(_norm(e) for e in arg_batch)
    out_dims = tuple(_norm(e) for e in out_batch)
    if not isinstance(psum_outs, dict):
        psum_outs = {i: _FACTORS for i in psum_outs}
    cp = custom_partitioning(fn)
    multi_out = len(out_dims) > 1

    def _factor_axes(shardings):
        """Mesh axes each factor is sharded over (first occurrence wins)."""
        axes = {}
        for sh, fmap in zip(shardings, arg_dims):
            if not isinstance(sh, NamedSharding):
                continue
            spec = sh.spec
            for f, d in fmap.items():
                if f in axes or d >= len(spec) or spec[d] is None:
                    continue
                a = spec[d]
                axes[f] = a if isinstance(a, tuple) else (a,)
        return axes

    def _all_axes(axes):
        return sum((axes[f] for f in _FACTORS if f in axes), ())

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        axes = _factor_axes([a.sharding for a in arg_shapes])
        ranks = [len(r.shape) for r in jax.tree.leaves(result_shape)]
        shs = [
            NamedSharding(mesh, _spec(r, fm, axes))
            for r, fm in zip(ranks, out_dims)
        ]
        return tuple(shs) if multi_out else shs[0]

    def partition(mesh, arg_shapes, result_shape):
        axes = _factor_axes([a.sharding for a in arg_shapes])
        arg_sh = tuple(
            NamedSharding(mesh, _spec(len(a.shape), fm, axes))
            for a, fm in zip(arg_shapes, arg_dims)
        )
        ranks = [len(r.shape) for r in jax.tree.leaves(result_shape)]
        out_sh = [
            NamedSharding(mesh, _spec(r, fm, axes))
            for r, fm in zip(ranks, out_dims)
        ]
        out_sh = tuple(out_sh) if multi_out else out_sh[0]
        flat_axes = _all_axes(axes)

        def lower_fn(*args):
            if flat_axes and seed_arg is not None and seed_stride is not None:
                # linear shard index over every sharded factor axis, so each
                # (chip, program) PRNG stream is distinct under dp, tp, and
                # dp×tp alike
                idx = lax.axis_index(
                    flat_axes[0] if len(flat_axes) == 1 else flat_axes
                )
                stride = np.int32(seed_stride(args))
                args = list(args)
                args[seed_arg] = args[seed_arg] + idx.astype(np.int32) * stride
            out = fn(*args)
            if flat_axes and psum_outs:
                outs = list(out) if multi_out else [out]
                for i, facs in psum_outs.items():
                    red = sum((axes[f] for f in facs if f in axes), ())
                    if red:
                        outs[i] = lax.psum(outs[i], red)
                out = tuple(outs) if multi_out else outs[0]
            return out

        return mesh, lower_fn, out_sh, arg_sh

    def sharding_rule(mesh, value_types, result_types):
        # ranks are only known at lowering time (several ops are
        # rank-generic); the callable form receives the MLIR types
        del mesh
        rule, repl = _sdy_rule(
            [len(t.shape) for t in value_types], arg_dims,
            [len(t.shape) for t in result_types], out_dims,
        )
        return rule, {"need_replication_factors": repl}

    cp.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=sharding_rule,
    )
    return cp


@functools.lru_cache(maxsize=None)
def batch_partitioned_cached(impl, n_in, n_out, *static):
    """Cached :func:`batch_partitioned` for the common all-batch-dim-0 case.

    ``impl(*arrays, *static)`` — arrays first, hashable statics last. One
    wrapper object per (impl, statics) signature, so repeated jit traces
    reuse the same custom-partitioning callable.
    """
    return batch_partitioned(
        lambda *arrays: impl(*arrays, *static),
        (0,) * n_in, (0,) * n_out,
    )


def elementwise_partitioned(fn, *, seed_arg, seed_stride):
    """Wrap an elementwise kernel so EVERY dim may stay sharded.

    The dropout-family kernels are elementwise over same-shaped array
    operands, so — unlike the structured attention/MLP kernels — no dim
    needs replication: under Megatron TP the fc1 hidden arrives
    feature-sharded ([B, N, F/tp]) and under sequence parallelism the
    residual stream arrives token-sharded; :func:`batch_partitioned`'s
    batch-only declaration made GSPMD all-gather those dims around the
    kernel (a per-block [B, N, 3072] gather in TP training). The rule
    here: all array operands and the output take the FIRST array operand's
    sharding verbatim; the seed stays replicated and is offset per shard
    by the linear shard index over every sharded mesh axis (dim order,
    matching ``lax.axis_index``'s row-major linearisation) × ``stride`` =
    the local PRNG-stream (grid) count. The offset is computed from the
    shard-local shapes identically in forward and backward — both wrappers
    see the same local operand shape and the same spec — so backward mask
    regeneration still matches exactly.

    Args:
      fn: positional function of arrays with one array output; close over
        static params first.
      seed_arg: index of the int32 ``[1]`` seed argument.
      seed_stride: ``f(local_args) -> int`` — PRNG streams one shard's
        kernel consumes (its local grid size).
    """
    cp = custom_partitioning(fn)

    def _operand_spec(arg_shapes):
        for i, a in enumerate(arg_shapes):
            if i == seed_arg:
                continue
            if isinstance(a.sharding, NamedSharding):
                return a.sharding.spec
        return P()

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        del result_shape
        return NamedSharding(mesh, _operand_spec(arg_shapes))

    def partition(mesh, arg_shapes, result_shape):
        del result_shape
        spec = _operand_spec(arg_shapes)
        sh = NamedSharding(mesh, spec)
        repl = NamedSharding(mesh, P())
        arg_sh = tuple(
            repl if i == seed_arg else sh for i in range(len(arg_shapes))
        )
        axes = []
        for entry in spec:
            if entry is None:
                continue
            axes.extend(entry if isinstance(entry, tuple) else (entry,))
        axes = tuple(axes)

        def lower_fn(*args):
            if axes:
                idx = lax.axis_index(axes[0] if len(axes) == 1 else axes)
                args = list(args)
                args[seed_arg] = (
                    args[seed_arg]
                    + idx.astype(np.int32) * np.int32(seed_stride(args))
                )
            return fn(*args)

        return mesh, lower_fn, sh, arg_sh

    def sharding_rule(mesh, value_types, result_types):
        del mesh
        rank = len(result_types[0].shape)
        letters = [f"e{d}" for d in range(rank)]
        shared = " ".join(letters)
        lhs = ", ".join(
            "zz" if i == seed_arg else shared
            for i in range(len(value_types))
        )
        return f"{lhs} -> {shared}", {"need_replication_factors": ("zz",)}

    cp.def_partition(
        partition,
        infer_sharding_from_operands=infer_sharding_from_operands,
        sharding_rule=sharding_rule,
    )
    return cp


@functools.lru_cache(maxsize=None)
def head_partitioned_cached(impl, arg_dims, out_dims, *static):
    """Cached :func:`batch_partitioned` for (batch, heads)-factor ops.

    ``arg_dims`` / ``out_dims``: per-array ``(batch_dim, head_dim)`` tuples
    (hashable, unlike dicts). Used by the attention kernels so tensor
    parallelism runs them on each chip's local heads — see
    ``ops/attention.py`` and ``models/layers.py::Attention``.
    """
    to_map = lambda e: {"b": e[0], "h": e[1]}  # noqa: E731
    return batch_partitioned(
        lambda *arrays: impl(*arrays, *static),
        tuple(to_map(e) for e in arg_dims),
        tuple(to_map(e) for e in out_dims),
    )


def tp_axis_in_context(axis: str = "model") -> bool:
    """True when tracing under a mesh whose ``axis`` has >1 shards.

    Reads the abstract mesh from the ambient context (set by
    ``jax.set_mesh`` around the trainer/eval jit calls), so model code can
    pick TP-safe dispatches and insert bare-PartitionSpec sharding
    constraints without threading a concrete Mesh through flax modules.
    Returns False outside any mesh context — single-device and plain-dp
    paths are unaffected.
    """
    try:
        mesh = jax.sharding.get_abstract_mesh()
    except Exception:  # pragma: no cover - older jax
        return False
    return bool(mesh is not None and mesh.shape.get(axis, 1) > 1)


def head_shard_constraint(x, head_dim: int, axis: str = "model",
                          batch_axis: str = "data"):
    """Pin an activation to batch×head sharding under TP (no-op otherwise).

    The qkv projection's output feature dim is a (3, H, d) fold whose
    contiguous Megatron column chunks do not align with whole (component,
    head) groups, so GSPMD cannot carry the GEMM output's sharding through
    the reshape to an explicit-heads layout — left alone it replicates, and
    the head-partitioned attention kernels would run every head on every
    chip. This constraint forces the one reshard (an all-to-all over ICI)
    that puts each chip's local heads in place. Applied only when tracing
    under a mesh context with a >1 ``axis`` and a divisible head count.
    """
    if not tp_axis_in_context(axis):
        return x
    mesh = jax.sharding.get_abstract_mesh()
    if x.shape[head_dim] % mesh.shape[axis]:
        return x  # indivisible heads: replicated fallback is correct
    entries = [None] * x.ndim
    entries[head_dim] = axis
    if batch_axis in mesh.shape:
        entries[0] = batch_axis
    return lax.with_sharding_constraint(x, P(*entries))


def seq_shard_constraint(x, token_dim: int = 1, axis: str = "model",
                         batch_axis: str = "data"):
    """Pin an activation to batch×token sharding under TP (no-op otherwise).

    Sequence parallelism (Megatron-SP): under tensor parallelism the
    residual stream is by default replicated along 'model' through the
    LayerNorm / dropout / residual-add segments between the matmul
    regions — every chip computes (and stores) the full [B, N, C] stream
    and the row-parallel proj/fc2 outputs arrive via all-reduce. With the
    stream constrained token-sharded instead, GSPMD splits each all-reduce
    into reduce-scatter (into the elementwise segment) + all-gather (out of
    it, before the next column-parallel GEMM) — same ICI bytes, but the
    elementwise compute and the stream's activation memory drop to 1/tp per
    chip. Ragged token counts (ViT's N = patches + CLS is odd) are handled
    by GSPMD's internal padding. Applied by Block/VisionTransformer when
    built with ``sp=True`` (config ``mesh.sp``).
    """
    if not tp_axis_in_context(axis):
        return x
    mesh = jax.sharding.get_abstract_mesh()
    entries = [None] * x.ndim
    entries[token_dim] = axis
    if batch_axis in mesh.shape:
        entries[0] = batch_axis
    return lax.with_sharding_constraint(x, P(*entries))
