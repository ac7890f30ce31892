"""Dropless grouped-GEMM execution for the MoE MLP (MegaBlocks-style).

The dense MoE path (``models/moe.py::MoEMlp``, the V-MoE recipe) pays for
its static shapes twice: every expert buffer is padded to the static
capacity ``C = ceil(k·S·cf/E)`` — at the default ``cf=1.25`` the expert
GEMMs compute 25% more token-slots than tokens routed — and the dispatch /
combine one-hot einsums are themselves [S, E·C]×[S, D]-sized GEMMs that
exist only to move rows around. MegaBlocks (PAPERS.md) showed the
alternative: drop nothing, sort the token→expert assignments by expert, and
run the expert GEMMs *ragged* — each expert multiplies exactly the rows
routed to it.

This module is that path, TPU-first:

* **Grouping without a sort.** The (token, choice) → destination-row
  permutation comes from one exact int32 cumsum over the [T, E] assignment
  one-hot (T = B·S·k is static) — the same XLA-friendly trick the dense
  path uses for capacity slots, minus the capacity clamp. One int32
  scatter inverts the permutation; rows are then *gathered* into
  expert-contiguous order (gathers beat scatters on TPU — the scatter
  appears only in the backward, where XLA lowers the gather's transpose).
* **Ragged expert GEMMs.** ``ragged_matmul`` dispatches between
  ``jax.lax.ragged_dot`` (XLA-native primitive — the portable/CPU path)
  and the Pallas ``megablox`` grouped-matmul kernel
  (``jax.experimental.pallas.ops.tpu.megablox``) on TPU, where it keeps
  the MXU on ragged group boundaries. Group sizes are data-dependent
  *values*; every shape stays static.
* **Dropless semantics.** Every (token, choice) pair is computed — there
  is no capacity, so ``capacity_factor`` does not apply and the combine is
  a per-token gather of exactly k rows (no scatter-add: each token owns k
  known destination rows).
* **Sharding = ``shard_map`` over the data axis.** Group offsets are a
  cumsum over the *local* batch, so the op must run shard-locally (the
  custom-partitioning wrappers in ``parallel/op_sharding.py`` cover
  fixed-shape kernels; here the grouping itself is data-dependent).
  :func:`sharded_grouped_moe` wraps the computation in ``jax.shard_map``
  against the ambient abstract mesh when the batch is sharded; autodiff
  through shard_map psums the replicated expert-weight gradients over the
  data axis automatically — the same reverse-collective story as
  ``parallel/pp.py``/``ring.py``. Expert parallelism (experts sharded over
  'model') stays on the dense path: ragged all-to-alls need data-dependent
  sizes that SPMD cannot carry; the Trainer enforces the split.

Reference anchor: the reference repo has no MoE at all (dense ViTs only,
``/root/reference/src/models/vit.py:125-127``); this is new-framework
surface, so the contract here is pinned by tests against a per-expert
numpy loop and the dense einsum path (``tests/test_moe_grouped.py``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

_GMM_TILE = (128, 128, 128)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def resolve_matmul_impl(impl: str = "auto") -> str:
    """'auto' → megablox on TPU, ragged_dot elsewhere (benchmark override:
    ``GAVIT_MOE_MATMUL=ragged_dot|megablox``)."""
    env = os.environ.get("GAVIT_MOE_MATMUL")
    if env:
        impl = env
    if impl == "auto":
        return "megablox" if _on_tpu() else "ragged_dot"
    if impl not in ("megablox", "ragged_dot"):
        raise ValueError(f"unknown grouped-MoE matmul impl {impl!r}")
    return impl


def ragged_matmul(x, w, group_sizes, *, impl: str = "ragged_dot",
                  interpret: bool = False):
    """[T, D] × [E, D, F] with the first ``group_sizes[e]`` remaining rows
    of ``x`` multiplying ``w[e]`` — rows must already be expert-contiguous.

    fp32 inputs run at HIGHEST precision (TPU fp32 dots default to bf16
    passes — the repo-wide parity rule); bf16 stays on the fast MXU path.
    """
    if impl == "megablox":
        from jax.experimental.pallas.ops.tpu.megablox.ops import gmm

        pad = (-x.shape[0]) % _GMM_TILE[0]
        if pad:
            # megablox tiles m in _GMM_TILE[0] rows; pad rows are booked to
            # the LAST group. They read x row 0 via the inverse-permutation
            # default (never zero-filled) but no pad row is ever gathered by
            # the combine, and their backward cotangent is exactly zero, so
            # they contribute nothing to dx/dW.
            x = jnp.pad(x, ((0, pad), (0, 0)))
            group_sizes = group_sizes.at[-1].add(pad)
        out = gmm(x, w, group_sizes, preferred_element_type=x.dtype,
                  tiling=_GMM_TILE, interpret=interpret)
        return out[: out.shape[0] - pad] if pad else out
    precision = (
        lax.Precision.HIGHEST if x.dtype == jnp.float32
        else lax.Precision.DEFAULT
    )
    return lax.ragged_dot(x, w, group_sizes, precision=precision,
                          preferred_element_type=x.dtype)


def group_by_expert(gate_idx, num_experts: int):
    """Expert-contiguous destination rows for every (token, choice) pair.

    Args:
      gate_idx: [..., k] int32 expert choices; flattened row-major, so pair
        order within an expert is (token-major, then choice) — any
        deterministic order is correct in a dropless design.
    Returns:
      dest:  int32, gate_idx's shape — destination row of each pair in the
        expert-sorted buffer (a permutation of [0, T)).
      src:   [T] int32 — inverse permutation: source pair of each sorted row.
      sizes: [E] int32 — rows per expert (sum = T).
    """
    flat = gate_idx.reshape(-1).astype(jnp.int32)
    t = flat.shape[0]
    onehot = (flat[:, None] == jnp.arange(num_experts,
                                          dtype=jnp.int32)[None, :])
    onehot = onehot.astype(jnp.int32)                       # [T, E]
    pos = jnp.cumsum(onehot, axis=0) - onehot               # queue position
    sizes = jnp.sum(onehot, axis=0)                         # [E]
    offsets = jnp.cumsum(sizes) - sizes                     # exclusive
    dest = jnp.sum(pos * onehot, axis=1) + offsets[flat]    # [T]
    src = jnp.zeros((t,), jnp.int32).at[dest].set(
        jnp.arange(t, dtype=jnp.int32))
    return dest.reshape(gate_idx.shape), src, sizes


def grouped_moe_mlp(x, gate_vals, gate_idx, w1, b1, w2, b2, key, *,
                    drop: float = 0.0, deterministic: bool = True,
                    approx_gelu: bool = False, matmul_impl: str = "auto"):
    """Dropless MoE MLP forward: route → gather → ragged GEMMs → combine.

    Args:
      x:         [G, S, D] tokens (compute dtype).
      gate_vals: [G, S, k] fp32 gates (already top-k'd / normalised).
      gate_idx:  [G, S, k] int32 expert ids.
      w1/b1/w2/b2: stacked expert weights [E, D, F]/[E, F]/[E, F, D]/[E, D]
        (cast to x.dtype by the caller).
      key:       PRNG key for dropout (ignored when deterministic).
    Returns [G, S, D] in x.dtype.
    """
    g, s, d = x.shape
    e = w1.shape[0]
    k = gate_idx.shape[-1]
    impl = resolve_matmul_impl(matmul_impl)

    dest, src, sizes = group_by_expert(gate_idx, e)
    x_sorted = x.reshape(g * s, d)[src // k]                # [T, D] gather
    e_sorted = gate_idx.reshape(-1)[src]                    # [T]

    h = ragged_matmul(x_sorted, w1, sizes, impl=impl) + b1[e_sorted]
    h = jax.nn.gelu(h, approximate=approx_gelu)
    if not deterministic and drop > 0.0:
        key, sub = jax.random.split(key)
        h = _dropout(h, drop, sub)
    y = ragged_matmul(h, w2, sizes, impl=impl) + b2[e_sorted]
    if not deterministic and drop > 0.0:
        key, sub = jax.random.split(key)
        y = _dropout(y, drop, sub)

    # combine: token t's output is the fp32 gate-weighted sum of its k rows
    y_tok = y[dest.reshape(-1)].reshape(g, s, k, d)
    out = jnp.sum(gate_vals[..., None] * y_tok.astype(jnp.float32), axis=2)
    return out.astype(x.dtype)


def _dropout(x, rate, key):
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def sharded_grouped_moe(x, gate_vals, gate_idx, w1, b1, w2, b2, key,
                        *, batch_axis: str = "data", **static):
    """Run :func:`grouped_moe_mlp` shard-locally along the data axis.

    Outside a mesh context (or when the batch axis has one shard, or does
    not divide the batch) this is a direct call — single-device behavior is
    untouched. Under a dp mesh, each shard groups and multiplies its own
    rows; shard_map's reverse pass psums the replicated weight gradients
    over the axis (the dp grad all-reduce that would otherwise happen at
    the step level).
    """
    mesh = jax.sharding.get_abstract_mesh()
    shards = mesh.shape.get(batch_axis, 1) if mesh is not None else 1
    if shards <= 1 or x.shape[0] % shards:
        return grouped_moe_mlp(x, gate_vals, gate_idx, w1, b1, w2, b2, key,
                               **static)

    def body(x, gate_vals, gate_idx, w1, b1, w2, b2, key):
        # distinct dropout streams per shard; identical fwd/bwd (the saved
        # mask is a VJP residual — no regeneration in this path)
        key = jax.random.fold_in(key, lax.axis_index(batch_axis))
        return grouped_moe_mlp(x, gate_vals, gate_idx, w1, b1, w2, b2, key,
                               **static)

    sharded = P(batch_axis)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(sharded, sharded, sharded, P(), P(), P(), P(), P()),
        out_specs=sharded,
    )(x, gate_vals, gate_idx, w1, b1, w2, b2, key)
