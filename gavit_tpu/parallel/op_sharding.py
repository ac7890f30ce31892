"""SPMD partitioning rules for the fused Pallas ops (batch-local execution).

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
with the rule "the batch dim is sharded, everything else is replicated", so
GSPMD/Shardy runs the kernel shard-locally on each chip's rows — the
TPU-native equivalent of the reference's per-GPU kernel launches, but
derived from the sharding annotations instead of explicit process code.

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

The wrapper is a no-op structurally when nothing is sharded along the batch
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


def _sdy_rule(arg_ranks, arg_batch, out_ranks, out_batch, psum_outs):
    """Einsum-notation Shardy rule: one shared factor ``b`` on every batch
    dim, a unique factor everywhere else, all non-batch factors marked
    need-replication ("only the batch dim may stay sharded")."""
    names = iter(
        f"{a}{b}" for a in string.ascii_lowercase if a != "b"
        for b in string.ascii_lowercase
    )
    factors = []

    def dims(rank, bdim):
        out = []
        for d in range(rank):
            if bdim is not None and d == bdim:
                out.append("b")
            else:
                f = next(names)
                factors.append(f)
                out.append(f)
        return " ".join(out)

    lhs = ", ".join(dims(r, bd) for r, bd in zip(arg_ranks, arg_batch))
    rhs = ", ".join(
        dims(r, None if i in psum_outs else bd)
        for i, (r, bd) in enumerate(zip(out_ranks, out_batch))
    )
    return f"{lhs} -> {rhs}", tuple(factors)


def _spec(rank, bdim, axes):
    entries = [None] * rank
    if bdim is not None and axes:
        entries[bdim] = axes
    return P(*entries)


def batch_partitioned(fn, arg_batch, out_batch, *, seed_arg=None,
                      seed_stride=None, psum_outs=()):
    """Wrap ``fn(*arrays)`` to execute shard-locally along the batch dim.

    Args:
      fn: positional-array function (close over static params first). Must
        return one array or a tuple of arrays.
      arg_batch: per-argument batch-dim index, or None for replicated
        operands (weights, seeds).
      out_batch: per-output batch-dim index (None: replicated output).
      seed_arg: index of an int32 seed argument to offset per shard.
      seed_stride: ``f(local_args) -> int`` — number of PRNG streams the
        kernel consumes on one shard (the per-shard grid size); the seed is
        offset by ``axis_index * stride``.
      psum_outs: output indices that are reductions over the batch dim —
        psum'd across the batch axis and returned replicated.
    Returns:
      A function with ``fn``'s signature, safe to call under ``jit`` whether
      or not operands are sharded.
    """
    arg_batch = tuple(arg_batch)
    out_batch = tuple(out_batch)
    psum_outs = frozenset(psum_outs)
    cp = custom_partitioning(fn)
    multi_out = len(out_batch) > 1

    def _batch_axes(shardings):
        """The mesh axes the batch dim is sharded over (first one found)."""
        for sh, bd in zip(shardings, arg_batch):
            if bd is None or not isinstance(sh, NamedSharding):
                continue
            spec = sh.spec
            if bd < len(spec) and spec[bd] is not None:
                axes = spec[bd]
                return axes if isinstance(axes, tuple) else (axes,)
        return ()

    def infer_sharding_from_operands(mesh, arg_shapes, result_shape):
        axes = _batch_axes([a.sharding for a in arg_shapes])
        ranks = [len(r.shape) for r in jax.tree.leaves(result_shape)]
        shs = [
            NamedSharding(mesh, _spec(r, None if i in psum_outs else bd, axes))
            for i, (r, bd) in enumerate(zip(ranks, out_batch))
        ]
        return tuple(shs) if multi_out else shs[0]

    def partition(mesh, arg_shapes, result_shape):
        axes = _batch_axes([a.sharding for a in arg_shapes])
        arg_sh = tuple(
            NamedSharding(mesh, _spec(len(a.shape), bd, axes))
            for a, bd in zip(arg_shapes, arg_batch)
        )
        ranks = [len(r.shape) for r in jax.tree.leaves(result_shape)]
        out_sh = [
            NamedSharding(mesh, _spec(r, None if i in psum_outs else bd, axes))
            for i, (r, bd) in enumerate(zip(ranks, out_batch))
        ]
        out_sh = tuple(out_sh) if multi_out else out_sh[0]

        def lower_fn(*args):
            if axes and seed_arg is not None and seed_stride is not None:
                idx = lax.axis_index(axes[0] if len(axes) == 1 else axes)
                stride = np.int32(seed_stride(args))
                args = list(args)
                args[seed_arg] = args[seed_arg] + idx.astype(np.int32) * stride
            out = fn(*args)
            if axes and psum_outs:
                outs = list(out) if multi_out else [out]
                for i in psum_outs:
                    outs[i] = lax.psum(outs[i], axes)
                out = tuple(outs) if multi_out else outs[0]
            return out

        return mesh, lower_fn, out_sh, arg_sh

    def sharding_rule(mesh, value_types, result_types):
        # ranks are only known at lowering time (several ops are
        # rank-generic); the callable form receives the MLIR types
        del mesh
        rule, repl = _sdy_rule(
            [len(t.shape) for t in value_types], arg_batch,
            [len(t.shape) for t in result_types], out_batch, psum_outs,
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
