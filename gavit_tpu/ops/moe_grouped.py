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
  ``parallel/pp.py``/``ring.py``.
* **Expert parallelism without an all-to-all.** A ragged all-to-all needs
  data-dependent sizes SPMD cannot carry — so the EP path never moves
  tokens at all. Activations under a dp×ep mesh are already replicated
  along 'model'; each expert shard *gathers* the rows routed to its local
  experts into a static, capacity-bounded buffer
  (``ceil(T·ep_capacity_factor/E)`` rows per expert — dropless within the
  bound; the unused tail rows are booked to the last group, so they ARE
  multiplied against the last expert's weights and masked out of the
  combine — compute scales with the capacity bound, correctness with the
  realized load), runs the ragged local-expert GEMMs, and
  one ``psum`` over 'model' combines the partial outputs — the same
  collective volume as the dense EP path's combine all-reduce, with zero
  dispatch GEMMs and zero slot padding in the compute.

Reference anchor: the reference repo has no MoE at all (dense ViTs only,
``/root/reference/src/models/vit.py:125-127``); this is new-framework
surface, so the contract here is pinned by tests against a per-expert
numpy loop and the dense einsum path (``tests/test_moe_grouped.py``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

def _gmm_tiling(m: int, k: int, n: int) -> tuple[int, int, int]:
    """Shape-aware megablox tile sizes.

    The megablox default (128,128,128) walks ~58k grid steps for one
    ViT-B-sized gmm ([50432,768]×[8,768,3072]) and is grid-step-bound, not
    MXU-bound: measured 42.9 ms fwd-pair vs 9.7 ms at (256,256,256) and
    5.1 ms at (512,768,768) (tools/r4_gmm_tile_probe.py,
    logs/r4_gmm_tiles.log). Rows are padded to tm by the caller; tk/tn
    handle remainders natively, but powers-of-two that divide the model
    dims (768/3072) keep every tile full. Override for experiments:
    ``GAVIT_GMM_TILE=tm,tk,tn``.
    """
    env = os.environ.get("GAVIT_GMM_TILE")
    if env:
        tm, tk, tn = (int(v) for v in env.split(","))
        return tm, tk, tn
    # prefer a tile that DIVIDES m: the host-side pad/slice copies of the
    # [m, k] operand measured ~20 ms/step at ViT-B b128 (T=50432 = 256·197,
    # so 256 pads nothing; 512 pads 256 rows per gmm call). (256,768,768)
    # vs (512,768,768) isolated: 10.44 vs 10.16 ms — the pad removal is
    # worth far more than the 3% kernel delta.
    # fallback stays a 128-row tile (8-sublane aligned; pad path covers the
    # remainder) — tm=m for odd m would hand Mosaic an unaligned block
    tm = next((t for t in (512, 256, 128) if m % t == 0), 128)
    tk = 768 if k % 768 == 0 else min(512, max(128, k))
    tn = 768 if n % 768 == 0 else min(512, max(128, n))
    return tm, tk, tn


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

        tiling = _gmm_tiling(x.shape[0], x.shape[1], w.shape[2])
        pad = (-x.shape[0]) % tiling[0]
        if pad:
            # megablox tiles m in tiling[0] rows; pad rows are booked to
            # the LAST group. They read x row 0 via the inverse-permutation
            # default (never zero-filled) but no pad row is ever gathered by
            # the combine, and their backward cotangent is exactly zero, so
            # they contribute nothing to dx/dW.
            x = jnp.pad(x, ((0, pad), (0, 0)))
            group_sizes = group_sizes.at[-1].add(pad)
        out = gmm(x, w, group_sizes, preferred_element_type=x.dtype,
                  tiling=tiling, interpret=interpret)
        return out[: out.shape[0] - pad] if pad else out
    precision = (
        lax.Precision.HIGHEST if x.dtype == jnp.float32
        else lax.Precision.DEFAULT
    )
    return lax.ragged_dot(x, w, group_sizes, precision=precision,
                          preferred_element_type=x.dtype)


# -- permutation gathers with gather transposes ---------------------------
#
# The dispatch (token rows → expert-sorted buffer) and combine (buffer rows
# → token·choice rows) moves are gathers whose autodiff transpose XLA emits
# as scatter-adds — serialized row updates on TPU, measured as a large
# chunk of the grouped engine's r4 gap vs the dense engine. Both index maps
# carry their exact inverse (``dest``/``src`` from the grouping), so the
# custom VJPs below express each transpose as a gather by the inverse map
# (+ a k-way reduce for dispatch). No scatter survives in the hot path.


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _dispatch_rows(x_flat, src_tok, dest, k: int, masked: bool):
    """``x_flat[src_tok]`` ([cap, D]); ``dest`` [T] is the inverse map
    (buffer row per (token, choice) pair; == cap for non-kept pairs).
    ``masked=False`` (the dropless non-EP path, where every pair is kept)
    skips the keep-select entirely — [T, D] selects measured ~40 ms/step
    of pure overhead in the r4 profile."""
    return x_flat[src_tok]


def _dispatch_rows_fwd(x_flat, src_tok, dest, k: int, masked: bool):
    return x_flat[src_tok], dest


def _dispatch_rows_bwd(k: int, masked: bool, dest, g):
    cap = g.shape[0]
    n_tok = dest.shape[0] // k
    if masked:
        dx = jnp.where((dest < cap)[:, None], g[jnp.minimum(dest, cap - 1)],
                       0)
    else:
        dx = g[dest]
    return dx.reshape(n_tok, k, -1).sum(axis=1), None, None


_dispatch_rows.defvjp(_dispatch_rows_fwd, _dispatch_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _combine_rows(y, dest, src, used_mask, masked: bool):
    """``y[dest]`` masked to kept pairs ([T, D]); ``src``/``used_mask``
    [cap] invert the map for the transpose (src of unused rows is 0 — the
    mask zeroes them). ``masked=False`` = the dropless non-EP path: dest
    is a permutation, every buffer row used — no selects."""
    if not masked:
        return y[dest]
    safe = jnp.minimum(dest, y.shape[0] - 1)
    return jnp.where((dest < y.shape[0])[:, None], y[safe], 0)


def _combine_rows_fwd(y, dest, src, used_mask, masked: bool):
    return _combine_rows(y, dest, src, used_mask, masked), (src, used_mask)


def _combine_rows_bwd(masked: bool, res, g):
    src, used_mask = res
    dy = g[src]
    if masked:
        dy = jnp.where(used_mask[:, None], dy, 0)
    return dy, None, None, None


_combine_rows.defvjp(_combine_rows_fwd, _combine_rows_bwd)


def _range_onehot(bounds, sizes, t: int, dtype):
    """[T, E] one-hot of each buffer row's expert, from the packed group
    ranges (no gather): row r belongs to expert e iff
    ``bounds[e] - sizes[e] <= r < bounds[e]``. Rows past ``bounds[-1]``
    (the parked EP tail) get an all-zero row — no bias, by design.

    Used to add the per-expert biases as a [T,E]×[E,F] GEMM: the autodiff
    transpose is then the db = onehotᵀ·g GEMM instead of the [T,F]→[E,F]
    scatter-add XLA emits for ``b[e_sorted]`` (measured ~27 ms/step, r4
    profile)."""
    r = jnp.arange(t, dtype=jnp.int32)[:, None]
    oh = (r >= (bounds - sizes)[None, :]) & (r < bounds[None, :])
    return lax.stop_gradient(oh.astype(dtype))


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


def group_local_experts(gate_idx, first, e_loc: int, cap_per_expert: int):
    """Expert-contiguous buffer rows for the LOCAL experts
    ``[first, first + e_loc)`` of one expert-parallel shard.

    Per-expert capacity clamping (not a shared-prefix clamp) keeps one hot
    expert from cascading drops onto every later expert; kept regions pack
    back-to-back so the buffer feeds a ragged GEMM directly.

    Returns:
      dest: int32 [T] — buffer row per (token, choice) pair; ``cap`` (one
        past the buffer end) marks non-local or over-capacity pairs.
      src:  int32 [cap] — inverse: source pair of each buffer row (0 for
        rows past the kept region — their output is never read back).
      kept: int32 [E_loc] — kept rows per local expert (≤ cap_per_expert);
        the unused tail is booked to the last group by the caller.
    """
    flat = gate_idx.reshape(-1).astype(jnp.int32)
    t = flat.shape[0]
    cap = e_loc * cap_per_expert
    rel = flat - jnp.int32(first)
    local = (rel >= 0) & (rel < e_loc)
    onehot = ((rel[:, None] == jnp.arange(e_loc, dtype=jnp.int32)[None, :])
              & local[:, None]).astype(jnp.int32)       # [T, E_loc]
    pos_mat = jnp.cumsum(onehot, axis=0) - onehot
    pos = jnp.sum(pos_mat * onehot, axis=1)             # within-expert rank
    sizes_full = jnp.sum(onehot, axis=0)                # realized load
    kept = jnp.minimum(sizes_full, cap_per_expert)
    offsets = jnp.cumsum(kept) - kept                   # packed, exclusive
    dest = offsets[jnp.clip(rel, 0, e_loc - 1)] + pos
    keep_pair = local & (pos < cap_per_expert)
    dest = jnp.where(keep_pair, dest, cap)
    src = jnp.zeros((cap,), jnp.int32).at[dest].set(
        jnp.arange(t, dtype=jnp.int32), mode="drop")
    return dest, src, kept


def grouped_moe_mlp_ep(x, gate_vals, gate_idx, w1, b1, w2, b2, key, *,
                       first, cap_per_expert: int, drop: float = 0.0,
                       deterministic: bool = True, approx_gelu: bool = False,
                       matmul_impl: str = "auto"):
    """One expert-parallel shard's slice of the dropless MoE MLP.

    ``w1/b1/w2/b2`` hold only this shard's ``E_loc`` experts; ``x`` and the
    gates hold this shard's (replicated-along-'model') tokens. Returns the
    PARTIAL output [G, S, D]: rows routed to remote experts contribute
    zero — the caller psums over the expert axis.
    """
    g, s, d = x.shape
    e_loc = w1.shape[0]
    k = gate_idx.shape[-1]
    cap = e_loc * cap_per_expert
    impl = resolve_matmul_impl(matmul_impl)

    if impl == "megablox":
        from gavit_tpu.ops.moe_fused import (grouped_moe_mlp_ep_fused,
                                             use_fused)

        if use_fused(drop, deterministic, x.dtype):
            # fused megakernel over STATIC per-expert regions (r5): same
            # per-expert capacity-drop semantics, zero data-dependent
            # bookkeeping
            return grouped_moe_mlp_ep_fused(
                x, gate_vals, gate_idx, w1, b1, w2, b2, key,
                first=first, cap_per_expert=cap_per_expert, drop=drop,
                deterministic=deterministic, approx_gelu=approx_gelu)

    dest, src, kept = group_local_experts(gate_idx, first, e_loc,
                                          cap_per_expert)
    x_sorted = _dispatch_rows(x.reshape(g * s, d), src // k, dest, k, True)
    bounds = jnp.cumsum(kept)
    sizes = kept.at[-1].add(cap - bounds[-1])           # book the tail
    # biases as a range-onehot GEMM (parked tail rows get zero bias —
    # they are garbage that is never gathered back)
    oh = _range_onehot(bounds, kept, cap, x.dtype)
    prec = (lax.Precision.HIGHEST if x.dtype == jnp.float32
            else lax.Precision.DEFAULT)

    h = ragged_matmul(x_sorted, w1, sizes, impl=impl) \
        + jnp.dot(oh, b1, precision=prec)
    h = jax.nn.gelu(h, approximate=approx_gelu)
    if not deterministic and drop > 0.0:
        key, sub = jax.random.split(key)
        h = _dropout(h, drop, sub)
    y = ragged_matmul(h, w2, sizes, impl=impl) \
        + jnp.dot(oh, b2, precision=prec)
    if not deterministic and drop > 0.0:
        key, sub = jax.random.split(key)
        y = _dropout(y, drop, sub)

    # combine: local pairs gather their buffer row, others contribute zero
    # (the parked tail is masked out of the transpose by used_rows)
    used_rows = jnp.arange(cap, dtype=jnp.int32) < bounds[-1]
    y_tok = _combine_rows(y, dest, src, used_rows, True).reshape(g, s, k, d)
    out = jnp.sum(gate_vals[..., None] * y_tok.astype(jnp.float32), axis=2)
    return out.astype(x.dtype)


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

    if impl == "megablox":
        from gavit_tpu.ops.moe_fused import grouped_moe_mlp_fused, use_fused

        if use_fused(drop, deterministic, x.dtype):
            # fused megakernel path (r5): both expert GEMMs + biases +
            # GELU + dropout in one VMEM pass per tile — removes the
            # [T, hidden] HBM round-trips, the onehot bias GEMMs and the
            # megablox irregular-tile metadata of the path below
            return grouped_moe_mlp_fused(
                x, gate_vals, gate_idx, w1, b1, w2, b2, key,
                drop=drop, deterministic=deterministic,
                approx_gelu=approx_gelu)

    dest, src, sizes = group_by_expert(gate_idx, e)
    x_sorted = _dispatch_rows(x.reshape(g * s, d), src // k,
                              dest.reshape(-1), k, False)   # [T, D] gather
    # biases as a range-onehot GEMM: transpose = db GEMM, not a scatter-add
    bounds = jnp.cumsum(sizes)
    oh = _range_onehot(bounds, sizes, x_sorted.shape[0], x.dtype)
    prec = (lax.Precision.HIGHEST if x.dtype == jnp.float32
            else lax.Precision.DEFAULT)

    h = ragged_matmul(x_sorted, w1, sizes, impl=impl) \
        + jnp.dot(oh, b1, precision=prec)
    h = jax.nn.gelu(h, approximate=approx_gelu)
    if not deterministic and drop > 0.0:
        key, sub = jax.random.split(key)
        h = _dropout(h, drop, sub)
    y = ragged_matmul(h, w2, sizes, impl=impl) \
        + jnp.dot(oh, b2, precision=prec)
    if not deterministic and drop > 0.0:
        key, sub = jax.random.split(key)
        y = _dropout(y, drop, sub)

    # combine: token t's output is the fp32 gate-weighted sum of its k rows
    y_tok = _combine_rows(
        y, dest.reshape(-1), src, src, False).reshape(g, s, k, d)
    out = jnp.sum(gate_vals[..., None] * y_tok.astype(jnp.float32), axis=2)
    return out.astype(x.dtype)


def _dropout(x, rate, key):
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def sharded_grouped_moe(x, gate_vals, gate_idx, w1, b1, w2, b2, key,
                        *, batch_axis: str = "data",
                        expert_axis: str = "model",
                        ep_capacity_factor: float = 2.0, **static):
    """Run the grouped engine shard-locally over the ambient mesh.

    Outside a mesh context (or on a trivial mesh) this is a direct call —
    single-device behavior is untouched. Under a dp mesh, each shard groups
    and multiplies its own rows; shard_map's reverse pass psums the
    replicated weight gradients over the axis (the dp grad all-reduce that
    would otherwise happen at the step level). When the ``expert_axis``
    ('model') has >1 shards, the expert bank additionally shards over it
    (expert parallelism): each shard runs :func:`grouped_moe_mlp_ep` on its
    local experts — a static buffer of ``ceil(T·ep_capacity_factor/E)``
    rows per expert, dropless within that bound — and a psum over the
    expert axis combines the partial outputs.
    """
    mesh = jax.sharding.get_abstract_mesh()
    dp = mesh.shape.get(batch_axis, 1) if mesh is not None else 1
    ep = mesh.shape.get(expert_axis, 1) if mesh is not None else 1
    if ep <= 1 and (dp <= 1 or x.shape[0] % dp):
        return grouped_moe_mlp(x, gate_vals, gate_idx, w1, b1, w2, b2, key,
                               **static)

    if ep > 1:
        e = w1.shape[0]
        if e % ep:
            raise ValueError(
                f"num_experts={e} must divide by the '{expert_axis}' mesh "
                f"axis ({ep}) for grouped expert parallelism")
        if x.shape[0] % dp:
            # ragged final eval/serving batch: replicate the batch (experts
            # stay sharded) instead of erroring — mirrors the dp-only
            # branch's graceful fallback above
            dp = 1
        e_loc = e // ep
        # per-expert static bound over the LOCAL token shard: expected load
        # is T/E rows; the factor is slack before (per-expert) drops
        t_local = (x.shape[0] // dp) * x.shape[1] * gate_idx.shape[-1]
        cap_per_expert = max(1, -(-int(t_local * ep_capacity_factor) // e))

        def body_ep(x, gate_vals, gate_idx, w1, b1, w2, b2, key):
            di = lax.axis_index(batch_axis) if dp > 1 else 0
            key = jax.random.fold_in(key, di * ep + lax.axis_index(expert_axis))
            part = grouped_moe_mlp_ep(
                x, gate_vals, gate_idx, w1, b1, w2, b2, key,
                first=lax.axis_index(expert_axis) * e_loc,
                cap_per_expert=cap_per_expert, **static)
            return lax.psum(part, expert_axis)

        data = P(batch_axis) if dp > 1 else P()
        expert = P(expert_axis)
        # check_vma=False: the custom-VJP permutation gathers hide the
        # varying-axis info vma inference needs; the transpose then psums
        # cotangents over every unmentioned axis (the pp.py/ring.py
        # convention) — dp×ep grads == single-device is pinned by
        # tests/test_moe_grouped.py
        return jax.shard_map(
            body_ep, mesh=mesh,
            in_specs=(data, data, data, expert, expert, expert, expert, P()),
            out_specs=data, check_vma=False,
        )(x, gate_vals, gate_idx, w1, b1, w2, b2, key)

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
