"""Fused grouped-MoE MLP megakernel: both expert GEMMs, biases, GELU and
dropout in one VMEM pass per row tile.

The r4 grouped engine (``ops/moe_grouped.py``) wins at b128-class token
counts but loses at b64 (BASELINE.md scaling probe): its per-step machinery
— the megablox grid metadata (histogram/repeat/roll), the range-onehot bias
GEMMs, and the [T, hidden] HBM round-trips between the two ragged GEMMs
(write h1, read+write GELU, read h1 again ≈ 620 MB/layer at b64) — is
~fixed relative to the slot-padding waste it reclaims. This module removes
that machinery:

* **Per-expert tile-aligned grouping** (:func:`group_by_expert_tiled`):
  each expert's row count is padded up to a multiple of the row tile
  ``tm`` (and to at least one tile), so every grid tile belongs to exactly
  ONE expert. The grid is static (``cap = round_up(T, tm) + E·tm`` rows),
  the tile→expert map is a small int32 vector fed through scalar prefetch,
  and megablox's irregular-tile metadata (histogram, repeat, roll,
  partial-tile revisits) disappears entirely. Pad rows read row 0 of the
  token buffer, are never gathered back by the combine, and carry exactly
  zero cotangent — they cost ≤ E·tm/T extra FLOPs (~4% at ViT-B b64).
* **One forward kernel** per row tile: ``x·W1[e] + b1[e] → GELU → dropout
  → ·W2[e] + b2[e] → out-dropout``, with the expert's weight pair resident
  in VMEM (block index = prefetched tile group — consecutive tiles of one
  expert reuse the buffers without re-DMA). Only the pre-GELU ``h1`` is
  written to HBM (bf16, the backward residual) — the [T, hidden]
  activations never exist in HBM, and the bias adds ride the GEMM epilogue
  instead of separate [T, E]-onehot GEMMs.
* **One backward kernel** fusing mask regeneration (same PRNG stream),
  GELU derivative (one-``exp`` combined form), the dropped-activation
  recompute (for dW2), dx = dh1·W1[e]ᵀ, and BOTH per-expert bias-grad
  reductions (accumulated in the revisited [E, ·] output blocks — the
  expert's tiles are consecutive, the tgmm accumulation pattern). dW1/dW2
  remain megablox ``tgmm`` calls over the kernel's outputs.

Sharding: the op is called shard-locally (inside
``sharded_grouped_moe``'s shard_map body) — no partitioning rules needed.
Reference anchor: the reference repo has no MoE
(``/root/reference/src/models/vit.py:125-127``); the contract is pinned
against ``ops/moe_grouped.py``'s measured engine by
``tests/test_moe_fused.py`` (interpret mode on CPU, exact fwd+grad
agreement with the unfused grouped path).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gavit_tpu.ops.dropout import _gelu_and_grad_f32, _gelu_f32
from gavit_tpu.ops.mlp import _fchunks, _gelu_tanh_f32, _mask, _prec


def _round_up(n: int, t: int) -> int:
    return -(-n // t) * t


def fused_cap(t: int, e: int, tm: int) -> int:
    """Static row capacity of the tiled buffer: every expert padded to a
    tile boundary (≥ 1 tile each) fits in round_up(T) + E·tm rows."""
    return _round_up(t, tm) + e * tm


def group_by_expert_tiled(gate_idx, num_experts: int, tm: int):
    """Expert-contiguous, per-expert tile-aligned destination rows.

    Args:
      gate_idx: [..., k] int32 expert choices (T = total pairs, static).
      tm: row tile — each expert's region is padded to a multiple of it.
    Returns:
      dest:  [T] int32 — destination row per (token, choice) pair
             (injective into [0, cap)).
      src:   [cap] int32 — inverse map (0 for pad rows).
      used:  [cap] bool — True at rows holding a real pair.
      tile_group: [cap // tm] int32 — owning expert of each row tile
             (tiles past the realized padded total book to the last
             expert; their rows are pads).
      group_sizes: [E] int32 — PADDED rows per expert, tail booked to the
             last expert (sums to cap) — the tgmm grouping.
    """
    flat = gate_idx.reshape(-1).astype(jnp.int32)
    t = flat.shape[0]
    e = num_experts
    cap = fused_cap(t, e, tm)
    onehot = (flat[:, None] == jnp.arange(e, dtype=jnp.int32)[None, :])
    onehot = onehot.astype(jnp.int32)                        # [T, E]
    pos = jnp.sum((jnp.cumsum(onehot, axis=0) - onehot) * onehot, axis=1)
    sizes = jnp.sum(onehot, axis=0)                          # realized [E]
    padded = jnp.maximum(-(-sizes // tm) * tm, tm)           # ≥ 1 tile each
    bounds = jnp.cumsum(padded)                              # inclusive
    offsets = bounds - padded                                # exclusive
    dest = offsets[flat] + pos                               # [T]
    src = jnp.zeros((cap,), jnp.int32).at[dest].set(
        jnp.arange(t, dtype=jnp.int32))
    used = jnp.zeros((cap,), bool).at[dest].set(True)
    tile_starts = jnp.arange(cap // tm, dtype=jnp.int32) * tm
    tile_group = jnp.minimum(
        jnp.sum((tile_starts[:, None] >= bounds[None, :]).astype(jnp.int32),
                axis=1),
        e - 1,
    )
    group_sizes = padded.at[-1].add(cap - bounds[-1])
    return dest, src, used, tile_group, group_sizes


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(tg_ref, seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                y_ref, h1_ref, *, rate: float, out_rate: float,
                approx: bool):
    del tg_ref  # consumed by the index maps
    prec = _prec(x_ref.dtype)
    x = x_ref[...]
    f = w1_ref.shape[1]
    nchunks = _fchunks(f)
    fc = f // nchunks
    if rate > 0.0 or out_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    keep2 = (_mask((x.shape[0], w2_ref.shape[1]), out_rate)
             if out_rate > 0.0 else None)
    y = b2_ref[...].astype(jnp.float32) * jnp.ones(
        (x.shape[0], 1), jnp.float32)
    for j in range(nchunks):
        sl = slice(j * fc, (j + 1) * fc)
        h1 = lax.dot_general(
            x, w1_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) + b1_ref[:, sl]
        h1 = h1.astype(h1_ref.dtype)       # round BEFORE the GELU so the
        h1_ref[:, sl] = h1                 # backward recompute agrees
        g = (_gelu_f32(h1.astype(jnp.float32)) if not approx
             else _gelu_tanh_f32(h1.astype(jnp.float32)))
        if rate > 0.0:
            keep = _mask(g.shape, rate)
            g = jnp.where(keep, g * (1.0 / (1.0 - rate)), 0.0)
        y = y + lax.dot_general(
            g.astype(x.dtype), w2_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
    if keep2 is not None:
        y = jnp.where(keep2, y * (1.0 / (1.0 - out_rate)), 0.0)
    y_ref[...] = y.astype(y_ref.dtype)


def _gelu_tanh_and_grad_f32(x):
    """tanh-GELU value AND derivative from one tanh evaluation:
    g = 0.5·x·(1+tanh u), u = c·(x + a·x³);
    g' = 0.5·(1+tanh u) + 0.5·x·(1−tanh²u)·c·(1+3a·x²)."""
    c = 0.7978845608028654  # sqrt(2/pi)
    a = 0.044715
    u = c * (x + a * x * x * x)
    th = jnp.tanh(u)
    g = 0.5 * x * (1.0 + th)
    dg = 0.5 * (1.0 + th) + 0.5 * x * (1.0 - th * th) * c * (
        1.0 + 3.0 * a * x * x)
    return g, dg


def _bwd_kernel(tg_ref, seed_ref, dy_ref, h1_ref, w1_ref, w2_ref,
                dx_ref, go_ref, dh1_ref, db1_ref, db2_ref, dye_ref=None, *,
                rate: float, out_rate: float, approx: bool = False):
    prec = _prec(dy_ref.dtype)
    i = pl.program_id(0)
    f = h1_ref.shape[1]
    nchunks = _fchunks(f)
    fc = f // nchunks

    prev = jnp.maximum(i - 1, 0)
    group_started = jnp.logical_or(i == 0, tg_ref[i] != tg_ref[prev])

    @pl.when(group_started)
    def _init():
        db1_ref[...] = jnp.zeros(db1_ref.shape, db1_ref.dtype)
        db2_ref[...] = jnp.zeros(db2_ref.shape, db2_ref.dtype)

    if rate > 0.0 or out_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + i)   # identical stream to forward
    dy = dy_ref[...]
    if out_rate > 0.0:
        keep2 = _mask(dy.shape, out_rate)
        dy = jnp.where(keep2, dy.astype(jnp.float32)
                       * (1.0 / (1.0 - out_rate)), 0.0).astype(dy.dtype)
        dye_ref[...] = dy
    dx = jnp.zeros((dy.shape[0], w1_ref.shape[0]), jnp.float32)
    for j in range(nchunks):
        sl = slice(j * fc, (j + 1) * fc)
        h1 = h1_ref[:, sl].astype(jnp.float32)
        # the SAME activation form as the forward — an erf-gradient for a
        # tanh forward would silently return wrong grads (r5 review #6)
        g, dg = (_gelu_tanh_and_grad_f32(h1) if approx
                 else _gelu_and_grad_f32(h1))
        if rate > 0.0:
            keep = _mask(g.shape, rate)
            scale = 1.0 / (1.0 - rate)
            g = jnp.where(keep, g * scale, 0.0)
            dg = jnp.where(keep, dg * scale, 0.0)
        dh = lax.dot_general(              # dy · W2[e][sl]ᵀ
            dy, w2_ref[sl, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dh1 = dh * dg
        dh1_ref[:, sl] = dh1.astype(dh1_ref.dtype)
        go_ref[:, sl] = g.astype(go_ref.dtype)
        db1_ref[:, sl] += jnp.sum(dh1, axis=0, keepdims=True)
        dx = dx + lax.dot_general(         # dh1 · W1[e][:, sl]ᵀ
            dh1.astype(dy.dtype), w1_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
    db2_ref[...] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)
    dx_ref[...] = dx.astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

_VMEM_FLOOR = 16 * 1024 * 1024


def _vmem_limit(*buffer_bytes: int) -> int:
    """Minimal whole-MB cap over the double-buffered working set — same
    policy as ops/mlp.py::vmem_limit_for (16 MB floor measured best when it
    fits; minimal raise otherwise, the ViT-L lesson)."""
    need = int(2 * sum(buffer_bytes) * 1.05)
    if need <= int(0.8 * _VMEM_FLOOR):
        return _VMEM_FLOOR
    return -(-int(need / 0.8) // (1024 * 1024)) * 1024 * 1024


def _row_spec(tm, cols):
    return pl.BlockSpec((tm, cols), lambda i, tg: (i, 0))


def _expert_spec(*block):
    return pl.BlockSpec((None,) + block, lambda i, tg: (tg[i],) + (0,) * len(block))


def _run_fwd(x_sorted, w1, b1, w2, b2, tile_group, seed, *, rate, out_rate,
             approx, tm, interpret):
    cap, d = x_sorted.shape
    e, _, f = w1.shape
    it = x_sorted.dtype.itemsize
    y, h1 = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, out_rate=out_rate,
                          approx=approx),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cap // tm,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                _row_spec(tm, d),
                _expert_spec(d, f),
                _expert_spec(1, f),
                _expert_spec(f, d),
                _expert_spec(1, d),
            ],
            out_specs=[_row_spec(tm, d), _row_spec(tm, f)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((cap, d), x_sorted.dtype),
            jax.ShapeDtypeStruct((cap, f), x_sorted.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem_limit(
                2 * d * f * it, tm * (2 * d + f) * it, tm * f * 4),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * cap * d * f,
            bytes_accessed=(2 * cap * d + cap * f + 2 * e * d * f) * it,
            transcendentals=cap * f,
        ),
        interpret=interpret,
    )(tile_group, seed, x_sorted, w1,
      b1.reshape(e, 1, f), w2, b2.reshape(e, 1, d))
    return y, h1


def _run_bwd(dy_sorted, h1, w1, w2, tile_group, seed, *, rate, out_rate,
             approx, tm, interpret):
    cap, d = dy_sorted.shape
    e, _, f = w1.shape
    it = dy_sorted.dtype.itemsize
    out_specs = [
        _row_spec(tm, d),
        _row_spec(tm, f),
        _row_spec(tm, f),
        _expert_spec(1, f),
        _expert_spec(1, d),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((cap, d), dy_sorted.dtype),
        jax.ShapeDtypeStruct((cap, f), dy_sorted.dtype),
        jax.ShapeDtypeStruct((cap, f), dy_sorted.dtype),
        jax.ShapeDtypeStruct((e, 1, f), jnp.float32),
        jax.ShapeDtypeStruct((e, 1, d), jnp.float32),
    ]
    if out_rate > 0.0:
        out_specs.append(_row_spec(tm, d))
        out_shape.append(jax.ShapeDtypeStruct((cap, d), dy_sorted.dtype))
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, out_rate=out_rate,
                          approx=approx),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cap // tm,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                _row_spec(tm, d),
                _row_spec(tm, f),
                _expert_spec(d, f),
                _expert_spec(f, d),
            ],
            out_specs=out_specs,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # sequential: the per-expert bias grads accumulate across the
            # (consecutive) tiles of each expert
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_vmem_limit(
                2 * d * f * it, tm * (3 * d + 3 * f) * it, tm * f * 4),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * cap * d * f,
            bytes_accessed=(3 * cap * d + 3 * cap * f + 2 * e * d * f) * it,
            transcendentals=2 * cap * f,
        ),
        interpret=interpret,
    )(tile_group, seed, dy_sorted, h1, w1, w2)
    if out_rate > 0.0:
        dx, go, dh1, db1, db2, dye = outs
    else:
        (dx, go, dh1, db1, db2), dye = outs, dy_sorted
    return dx, go, dh1, db1, db2, dye


# ---------------------------------------------------------------------------
# differentiable op
# ---------------------------------------------------------------------------


def _tgmm_tiling(m: int, k_dim: int, n_dim: int):
    """tgmm tile sizes: the row tile MUST divide the (already tile-aligned)
    cap — megablox tgmm raises otherwise; k/n follow the r4 gmm probe's
    model-dim-divisor rule."""
    tm = next((t for t in (512, 256, 128, 64, 32, 16, 8) if m % t == 0), 8)
    tk = 768 if k_dim % 768 == 0 else min(512, max(8, k_dim))
    tn = 768 if n_dim % 768 == 0 else min(512, max(8, n_dim))
    return tm, tk, tn


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def fused_grouped_mlp(x_sorted, w1, b1, w2, b2, tile_group, group_sizes,
                      seed, rate: float, out_rate: float, approx: bool,
                      tm: int, interpret: bool = False):
    """out_drop(drop(GELU(x_sorted·W1[e] + b1[e]))·W2[e] + b2[e]) over
    per-expert tile-aligned rows, expert-fused in one VMEM pass.

    Args:
      x_sorted: [cap, D] rows in tiled expert order
        (:func:`group_by_expert_tiled`; pad rows may hold garbage — their
        outputs are never read and their upstream cotangent must be zero,
        which the padded combine guarantees).
      w1/b1/w2/b2: stacked expert weights [E,D,F]/[E,F]/[E,F,D]/[E,D].
      tile_group: [cap // tm] int32 owning expert per row tile.
      group_sizes: [E] int32 padded rows per expert (sum = cap) — consumed
        by the dW tgmm calls in the backward.
      seed: int32 [1] kernel PRNG seed.
    Returns [cap, D].
    """
    y, _ = _fused_fwd(x_sorted, w1, b1, w2, b2, tile_group, group_sizes,
                      seed, rate, out_rate, approx, tm, interpret)
    return y


def _fused_fwd(x_sorted, w1, b1, w2, b2, tile_group, group_sizes, seed,
               rate, out_rate, approx, tm, interpret):
    y, h1 = _run_fwd(x_sorted, w1, b1, w2, b2, tile_group, seed,
                     rate=rate, out_rate=out_rate, approx=approx, tm=tm,
                     interpret=interpret)
    return y, (x_sorted, h1, w1, w2, tile_group, group_sizes, seed)


def _fused_bwd(rate, out_rate, approx, tm, interpret, res, gy):
    import importlib

    # the package __init__ shadows the gmm MODULE with the custom-vjp gmm
    # FUNCTION — import the module itself for backend.tgmm
    backend = importlib.import_module(
        "jax.experimental.pallas.ops.tpu.megablox.gmm")

    x_sorted, h1, w1, w2, tile_group, group_sizes, seed = res
    dy = gy.astype(x_sorted.dtype)
    dx, go, dh1, db1, db2, dye = _run_bwd(
        dy, h1, w1, w2, tile_group, seed,
        rate=rate, out_rate=out_rate, approx=approx, tm=tm,
        interpret=interpret)
    cap, d = x_sorted.shape
    f = w1.shape[2]
    # dW via grouped transposed matmuls; pad rows carry zero dy/dh1 so they
    # contribute nothing even though they are booked to a group
    dw1 = backend.tgmm(
        x_sorted.swapaxes(0, 1), dh1, group_sizes, w1.dtype,
        _tgmm_tiling(cap, d, f), interpret=interpret)
    dw2 = backend.tgmm(
        go.swapaxes(0, 1), dye, group_sizes, w2.dtype,
        _tgmm_tiling(cap, f, d), interpret=interpret)
    return (dx, dw1, db1.reshape(db1.shape[0], -1).astype(w1.dtype),
            dw2, db2.reshape(db2.shape[0], -1).astype(w2.dtype),
            None, None, None)


fused_grouped_mlp.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# padded combine (token gather with masked transpose)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def combine_rows_padded(y, dest, src, used):
    """``y[dest]`` where ``dest`` is injective into a LARGER buffer: no
    forward select (every dest row is real), masked transpose (pad rows
    must receive exactly zero cotangent — the correctness contract of the
    tiled buffer's garbage rows)."""
    return y[dest]


def _crp_fwd(y, dest, src, used):
    return y[dest], (src, used)


def _crp_bwd(res, g):
    src, used = res
    return jnp.where(used[:, None], g[src], 0), None, None, None


combine_rows_padded.defvjp(_crp_fwd, _crp_bwd)


def group_local_experts_tiled(gate_idx, first, e_loc: int,
                              cap_per_expert: int, tm: int):
    """Tile-aligned variant of ``group_local_experts`` for the fused EP
    path: each local expert owns a STATIC region of
    ``round_up(cap_per_expert, tm)`` rows (kept pairs pack at its start),
    so offsets, the tile→expert map and the tgmm group sizes are all
    static — no data-dependent bookkeeping at all.

    Returns (dest [T] — ``cap_pad`` marks non-local/over-capacity pairs,
    src [cap_pad], used [cap_pad] bool, tile_group [n_tiles] np.int32
    STATIC, group_sizes [E_loc] np.int32 STATIC).
    """
    import numpy as np

    region = _round_up(cap_per_expert, tm)
    cap_pad = e_loc * region
    flat = gate_idx.reshape(-1).astype(jnp.int32)
    t = flat.shape[0]
    rel = flat - jnp.int32(first)
    local = (rel >= 0) & (rel < e_loc)
    onehot = ((rel[:, None] == jnp.arange(e_loc, dtype=jnp.int32)[None, :])
              & local[:, None]).astype(jnp.int32)
    pos = jnp.sum((jnp.cumsum(onehot, axis=0) - onehot) * onehot, axis=1)
    keep = local & (pos < cap_per_expert)
    dest = jnp.where(keep, jnp.clip(rel, 0, e_loc - 1) * region + pos,
                     cap_pad)
    src = jnp.zeros((cap_pad,), jnp.int32).at[dest].set(
        jnp.arange(t, dtype=jnp.int32), mode="drop")
    used = jnp.zeros((cap_pad,), bool).at[dest].set(True, mode="drop")
    tile_group = np.repeat(np.arange(e_loc, dtype=np.int32), region // tm)
    group_sizes = np.full((e_loc,), region, np.int32)
    return dest, src, used, jnp.asarray(tile_group), jnp.asarray(group_sizes)


def grouped_moe_mlp_ep_fused(x, gate_vals, gate_idx, w1, b1, w2, b2, key, *,
                             first, cap_per_expert: int, drop: float = 0.0,
                             deterministic: bool = True,
                             approx_gelu: bool = False,
                             interpret: bool = False):
    """One expert-parallel shard's slice of the MoE MLP on the fused
    megakernel (drop-in for ``ops.moe_grouped.grouped_moe_mlp_ep`` —
    identical math incl. per-expert capacity drops; caller psums over the
    expert axis)."""
    from gavit_tpu.ops.dropout import dropout_seed

    g, s, d = x.shape
    e_loc = w1.shape[0]
    k = gate_idx.shape[-1]
    tm = fused_tm(g * s * k, e_loc)
    dest, src, used, tile_group, group_sizes = group_local_experts_tiled(
        gate_idx, first, e_loc, cap_per_expert, tm)
    cap_pad = int(used.shape[0])
    from gavit_tpu.ops.moe_grouped import _dispatch_rows

    # masked dispatch (scatter-free transpose): non-kept pairs gather row 0
    # garbage into pad rows whose outputs are never read; their cotangent
    # is zeroed by the masked VJP
    x_sorted = _dispatch_rows(x.reshape(g * s, d), src // k, dest, k, True)
    rate = drop if (not deterministic and drop > 0.0) else 0.0
    seed = (dropout_seed(key) if rate > 0.0
            else jnp.zeros((1,), jnp.int32))
    y = fused_grouped_mlp(x_sorted, w1, b1, w2, b2, tile_group, group_sizes,
                          seed, rate, rate, approx_gelu, tm, interpret)
    # combine with OOB masking (dest == cap_pad for dropped/remote pairs)
    safe = jnp.minimum(dest, cap_pad - 1)
    y_tok = jnp.where((dest < cap_pad)[:, None],
                      _combine_padded_oob(y, safe, src, used), 0)
    y_tok = y_tok.reshape(g, s, k, d)
    out = jnp.sum(gate_vals[..., None] * y_tok.astype(jnp.float32), axis=2)
    return out.astype(x.dtype)


@jax.custom_vjp
def _combine_padded_oob(y, safe_dest, src, used):
    return y[safe_dest]


def _cpo_fwd(y, safe_dest, src, used):
    return y[safe_dest], (src, used)


def _cpo_bwd(res, g):
    src, used = res
    # pad/unused rows get exactly zero; the caller's where() already zeroed
    # the OOB pairs' upstream grad contribution via its own select
    return jnp.where(used[:, None], g[src], 0), None, None, None


_combine_padded_oob.defvjp(_cpo_fwd, _cpo_bwd)


def grouped_moe_mlp_fused(x, gate_vals, gate_idx, w1, b1, w2, b2, key, *,
                          drop: float = 0.0, deterministic: bool = True,
                          approx_gelu: bool = False,
                          interpret: bool = False):
    """Dropless grouped MoE MLP on the fused megakernel path: tiled
    grouping → gather → one fused fwd kernel (custom-VJP backward) →
    padded combine. Drop-in for ``ops.moe_grouped.grouped_moe_mlp``
    (identical math; the dropout STREAM differs — it is the kernel PRNG,
    like the dense megakernel's)."""
    from gavit_tpu.ops.dropout import dropout_seed
    from gavit_tpu.ops.moe_grouped import _dispatch_rows

    g, s, d = x.shape
    e = w1.shape[0]
    k = gate_idx.shape[-1]
    t = g * s * k
    tm = fused_tm(t, e)
    dest, src, used, tile_group, group_sizes = group_by_expert_tiled(
        gate_idx, e, tm)
    x_sorted = _dispatch_rows(x.reshape(g * s, d), src // k, dest, k, False)
    rate = drop if (not deterministic and drop > 0.0) else 0.0
    seed = (dropout_seed(key) if rate > 0.0
            else jnp.zeros((1,), jnp.int32))
    y = fused_grouped_mlp(x_sorted, w1, b1, w2, b2, tile_group, group_sizes,
                          seed, rate, rate, approx_gelu, tm, interpret)
    y_tok = combine_rows_padded(y, dest, src, used).reshape(g, s, k, d)
    out = jnp.sum(gate_vals[..., None] * y_tok.astype(jnp.float32), axis=2)
    return out.astype(x.dtype)


def fused_tm(t: int, e: int = 8) -> int:
    """Row tile scaled to the token count: 256 at measured flagship-class
    T (the r4 gmm tile probe's sweet spot), smaller when E·tm padding
    would dominate — the tiled grouping books up to ~E·tm pad rows, so tm
    is capped at ~T/(8·E) (≤ ~12.5% pad FLOPs; r5 review finding #4).
    Tiny inputs (tests) drop to 8-row tiles."""
    env = os.environ.get("GAVIT_MOE_FUSED_TM")
    if env:
        return int(env)
    if t < 2048:
        return 8
    for tm in (256, 128, 64, 32, 16):
        if e * tm * 8 <= t:
            return tm
    return 8


def use_fused(drop_rate: float, deterministic: bool, dtype) -> bool:
    """Fused path gate: TPU only (CPU tests call with interpret=True
    explicitly), both dtypes, env kill-switch GAVIT_MOE_FUSED=0. Also
    false when the grouped matmul backend is overridden away from
    megablox (GAVIT_MOE_MATMUL=ragged_dot) — the fused kernel only rides
    the megablox path, and `moe.impl: auto` keys its no-crossover policy
    on this gate (r5 review finding #3)."""
    del drop_rate, deterministic, dtype
    if os.environ.get("GAVIT_MOE_FUSED", "1") == "0":
        return False
    from gavit_tpu.ops.moe_grouped import resolve_matmul_impl

    if resolve_matmul_impl("auto") != "megablox":
        return False
    return jax.default_backend() == "tpu"
