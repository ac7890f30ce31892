"""Fused MLP megakernel: fc1 → exact-GELU → dropout → fc2 in one VMEM pass.

The reference MLP (``/root/reference/src/models/vit.py:75-94``) is two
Linears with a GELU between them; on TPU the [M, 4D] intermediate dominates
the HBM traffic of the whole block. The round-2 profile (BASELINE.md) put
the MLP pools at fc1 24.9 + fc2 23.4 + fused-GELU(+dropout) epilogue
15.9 ms/step at ViT-B b128, with the epilogue 1.4× over its HBM floor —
because the chain materialises the [25216, 3072] hidden activations in HBM
THREE times (fc1 write, epilogue read+write, fc2 read).

This kernel keeps both weight matrices VMEM-resident (4.7 MB each at ViT-B)
and streams row blocks of the token matrix through fc1 → GELU → dropout →
fc2 without the hidden activations ever existing in HBM; only the pre-GELU
``h1`` is written once (bf16) as the backward residual. The backward fuses
the dh GEMM (dy·W2ᵀ) with mask regeneration (hardware PRNG, same stream as
forward), the GELU derivative, the recomputation of the dropped activations
(needed for dW2, so the forward doesn't store them), and both bias-grad
row-reductions (accumulated in VMEM across the sequential grid — replacing
the augmented-GEMM bias trick for these two sites). dx/dW1/dW2 remain XLA
GEMMs over the kernel's outputs.

Per layer this removes ~530 MB of forward and ~260 MB of backward HBM
traffic at ViT-B b128 versus the unfused chain, at identical GEMM count (6).

Dispatch: training-only (the deterministic path keeps the inference-tuned
tanh-GELU XLA chain), rows must divide into clean blocks (``pick_block``),
falls back to the unfused path otherwise (e.g. 384px's prime token count).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gavit_tpu.ops.dropout import (_gelu_and_grad_f32, _gelu_f32,
                                    _gelu_grad_f32)
from gavit_tpu.parallel.op_sharding import batch_partitioned


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _prec(dtype):
    if dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


import os

# 16 MB measured fastest when the working set fits: raising the Mosaic VMEM
# cap to 100 MB REGRESSED the train step 1.5-3 ms (r3 probe4 bisect —
# looser buffer policy hurts pipelining more than the headroom helps). At
# 16 MB the ViT-B working set (both weights resident, 9.4 MB + bm=64
# streaming blocks) still fits. Larger models (ViT-L: 16.8 MB of weights
# alone) get the MINIMAL raise that fits instead of the unfused fallback —
# measured 213.0 vs 240.5 ms/step at ViT-L b64 (r4, logs/r4_queue2.log) —
# bounded by GAVIT_MLP_VMEM_MB_MAX.
_VMEM_LIMIT = int(os.environ.get("GAVIT_MLP_VMEM_MB", "16")) * 1024 * 1024
_VMEM_BUDGET = int(0.8 * _VMEM_LIMIT)
_VMEM_MAX = int(os.environ.get("GAVIT_MLP_VMEM_MB_MAX", "48")) * 1024 * 1024


def _vmem_need(bm: int, d: int, f: int, itemsize: int,
               w_elems: int | None = None) -> int:
    # resident weights: both matrices for the forward; the backward holds
    # only w2 ([f, d]) — pass w_elems to charge the actual resident set so
    # near-16-MB shapes keep the measured-best floor (r4 advisor finding)
    if w_elems is None:
        w_elems = 2 * d * f
    fixed = w_elems * itemsize + (f + d) * 4
    # double-buffered streaming blocks + fp32 temporaries (h1, gelu,
    # random bits) — a deliberate overestimate; Mosaic reuses temps
    per_row = 2 * (2 * d * itemsize + f * itemsize) + 3 * f * 4
    return fixed + bm * per_row


def vmem_limit_for(bm: int, d: int, f: int, itemsize: int,
                   w_elems: int | None = None) -> int:
    """Mosaic vmem_limit_bytes for this call: the measured-best floor when
    the working set fits it, else the minimal raise that fits (whole MBs)."""
    need = _vmem_need(bm, d, f, itemsize, w_elems)
    if need <= _VMEM_BUDGET:
        return _VMEM_LIMIT
    return -(-int(need / 0.8) // (1024 * 1024)) * 1024 * 1024


def pick_block(m: int, d: int, f: int, itemsize: int) -> int | None:
    """Largest row block that (a) divides ``m`` exactly — block rows never
    cross the array edge, so the backward's bias accumulation sums no
    out-of-bounds garbage — and (b) fits the VMEM bound (the 16 MB floor,
    stretched to GAVIT_MLP_VMEM_MB_MAX for over-16-MB weight sets — see
    vmem_limit_for). None → caller must use the unfused path."""
    env = os.environ.get("GAVIT_MLP_BM")
    if env:
        bm = int(env)
        return bm if m % bm == 0 else None
    # 64 first: measured best at ViT-B b128 (fwd+bwd 6.03 ms vs 6.27 at 128,
    # 8.46 at 256 — BASELINE.md r3 sweep); larger blocks only if 64 ∤ m.
    # No tails below 32: bm=16 wins ISOLATED at 384px (4.21 vs 4.58 ms at
    # m=9232) but LOSES 12 ms/step in-model (71.6 vs 59.4 — the tiny-block
    # megakernel can't overlap with neighboring work the way the XLA chain
    # does), and at the shard-local m=3152 the chain wins isolated too
    # (2.33 vs 2.47 ms) — BASELINE.md r3. Shapes with no ≥32 divisor take
    # the unfused chain.
    # fp32 keeps the 16 MB budget (and thus the XLA chain at ViT-B+):
    # the fp32 path is the logit-parity path, validated against the torch
    # reference on the chain — only the bf16 production path stretches to
    # _VMEM_MAX (the ViT-L fix)
    budget = int(0.8 * _VMEM_MAX) if itemsize == 2 else _VMEM_BUDGET
    for bm in (64, 128, 256, 512, 32):
        if m % bm:
            continue
        if _vmem_need(bm, d, f, itemsize) <= budget:
            return bm
    return None


def _mask(bits_shape, rate):
    bits = pltpu.bitcast(pltpu.prng_random_bits(bits_shape), jnp.uint32)
    return bits >= jnp.uint32(int(rate * 0xFFFFFFFF))


def _fchunks(f: int) -> int:
    """Hidden-dim chunk count for the forward kernel's software pipeline.

    The unchunked kernel serialises fc1-MXU → GELU-VPU → fc2-MXU per
    program (measured 1.71 ms/block vs a 1.21 ms MXU floor at ViT-B b128).
    Splitting F into chunks breaks the dependency between chunk j's GELU
    and chunk j+1's fc1 GEMM, letting Mosaic's scheduler overlap VPU and
    MXU work. The dropout-mask PRNG stream is consumed chunk-by-chunk in
    the same order by forward and backward, so masks still agree.
    """
    n = int(os.environ.get("GAVIT_MLP_FCHUNKS", "4"))
    while n > 1 and (f % n or (f // n) % 128):
        n -= 1
    return max(1, n)


def _mlp_fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    y_ref, h1_ref, *, rate: float, out_rate: float,
                    add_bias2: bool = True):
    prec = _prec(x_ref.dtype)
    x = x_ref[...]
    f = w1_ref.shape[1]
    nchunks = _fchunks(f)
    fc = f // nchunks
    if rate > 0.0 or out_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    # output-dropout mask drawn FIRST so the backward (which needs it before
    # the chunk loop) consumes the PRNG stream in the same order
    keep2 = (
        _mask((x.shape[0], w2_ref.shape[1]), out_rate)
        if out_rate > 0.0 else None
    )
    # under Megatron TP (f-sharded) each shard's y is a partial sum; the
    # bias is added once, after the psum, by the caller (add_bias2=False)
    if add_bias2:
        y = b2_ref[...].astype(jnp.float32) * jnp.ones(
            (x.shape[0], 1), jnp.float32
        )
    else:
        y = jnp.zeros((x.shape[0], w2_ref.shape[1]), jnp.float32)
    for j in range(nchunks):
        sl = slice(j * fc, (j + 1) * fc)
        h1 = jax.lax.dot_general(
            x, w1_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) + b1_ref[:, sl]
        # round to the storage dtype BEFORE the GELU so forward and
        # backward (which recomputes from the stored h1) agree
        h1 = h1.astype(h1_ref.dtype)
        h1_ref[:, sl] = h1
        g = _gelu_f32(h1.astype(jnp.float32))
        if rate > 0.0:
            keep = _mask(g.shape, rate)
            g = jnp.where(keep, g * (1.0 / (1.0 - rate)), 0.0)
        y = y + jax.lax.dot_general(
            g.astype(x.dtype), w2_ref[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
    if keep2 is not None:
        y = jnp.where(keep2, y * (1.0 / (1.0 - out_rate)), 0.0)
    y_ref[...] = y.astype(y_ref.dtype)


def _mlp_bwd_kernel(seed_ref, dy_ref, h1_ref, w2_ref,
                    dh1_ref, go_ref, db1_ref, db2_ref, dye_ref=None, *,
                    rate: float, out_rate: float):
    prec = _prec(dy_ref.dtype)
    i = pl.program_id(0)
    f = h1_ref.shape[1]
    nchunks = _fchunks(f)
    fc = f // nchunks

    @pl.when(i == 0)
    def _init():
        db1_ref[...] = jnp.zeros(db1_ref.shape, db1_ref.dtype)
        db2_ref[...] = jnp.zeros(db2_ref.shape, db2_ref.dtype)

    if rate > 0.0 or out_rate > 0.0:
        # identical stream to the forward program at this grid position —
        # out-mask first, then the chunk-by-chunk hidden masks
        pltpu.prng_seed(seed_ref[0] + i)
    dy = dy_ref[...]
    if out_rate > 0.0:
        keep2 = _mask(dy.shape, out_rate)
        dy = jnp.where(keep2, dy.astype(jnp.float32)
                       * (1.0 / (1.0 - out_rate)), 0.0).astype(dy.dtype)
        # the effective (post-out-dropout) upstream gradient, needed in HBM
        # by the XLA dW2 GEMM
        dye_ref[...] = dy
    for j in range(nchunks):
        sl = slice(j * fc, (j + 1) * fc)
        h1 = h1_ref[:, sl].astype(jnp.float32)
        g, dg = _gelu_and_grad_f32(h1)  # one exp for both (BASELINE.md r3)
        if rate > 0.0:
            keep = _mask(g.shape, rate)
            scale = 1.0 / (1.0 - rate)
            g = jnp.where(keep, g * scale, 0.0)
            dg = jnp.where(keep, dg * scale, 0.0)
        dh = jax.lax.dot_general(  # dy · W2[sl]ᵀ, transpose never built
            dy, w2_ref[sl, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dh1 = dh * dg
        dh1_ref[:, sl] = dh1.astype(dh1_ref.dtype)
        go_ref[:, sl] = g.astype(go_ref.dtype)
        db1_ref[:, sl] += jnp.sum(dh1, axis=0, keepdims=True)
    db2_ref[...] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _row_spec(bm, cols):
    return pl.BlockSpec((bm, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _run_fwd(x2, w1, b1, w2, b2, seed, rate, out_rate, bm, add_bias2=True):
    m, d = x2.shape
    f = w1.shape[1]
    y, h1 = pl.pallas_call(
        functools.partial(_mlp_fwd_kernel, rate=rate, out_rate=out_rate,
                          add_bias2=add_bias2),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _row_spec(bm, d),
            _const_spec((d, f)),
            _const_spec((1, f)),
            _const_spec((f, d)),
            _const_spec((1, d)),
        ],
        out_specs=[_row_spec(bm, d), _row_spec(bm, f)],
        out_shape=[
            jax.ShapeDtypeStruct((m, d), x2.dtype),
            jax.ShapeDtypeStruct((m, f), x2.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem_limit_for(bm, d, f, x2.dtype.itemsize),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * f,
            bytes_accessed=(2 * m * d + m * f + 2 * d * f) * x2.dtype.itemsize,
            transcendentals=m * f,
        ),
    )(seed, x2, w1, b1, w2, b2)
    return y, h1


def _run_bwd(dy2, h1, w2, seed, rate, out_rate, bm):
    m, d = dy2.shape
    f = h1.shape[1]
    out_specs = [
        _row_spec(bm, f),
        _row_spec(bm, f),
        _const_spec((1, f)),
        _const_spec((1, d)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((m, f), dy2.dtype),
        jax.ShapeDtypeStruct((m, f), dy2.dtype),
        jax.ShapeDtypeStruct((1, f), jnp.float32),
        jax.ShapeDtypeStruct((1, d), jnp.float32),
    ]
    if out_rate > 0.0:
        # the post-out-dropout upstream gradient, consumed by the dW2 GEMM
        out_specs.append(_row_spec(bm, d))
        out_shape.append(jax.ShapeDtypeStruct((m, d), dy2.dtype))
    outs = pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, rate=rate, out_rate=out_rate),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            _row_spec(bm, d),
            _row_spec(bm, f),
            _const_spec((f, d)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # sequential grid: the bias-grad outputs accumulate across steps
            dimension_semantics=("arbitrary",),
            # only w2 [f, d] is kernel-resident — charging both matrices
            # would raise the cap (and loosen Mosaic's buffer policy) for
            # shapes that actually fit the measured-best 16 MB floor
            vmem_limit_bytes=vmem_limit_for(bm, d, f, dy2.dtype.itemsize,
                                            w_elems=f * d),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * d * f,
            bytes_accessed=(m * d + 3 * m * f + d * f) * dy2.dtype.itemsize,
            transcendentals=2 * m * f,
        ),
    )(seed, dy2, h1, w2)
    if out_rate > 0.0:
        dh1, go, db1, db2, dye = outs
    else:
        (dh1, go, db1, db2), dye = outs, dy2
    return dh1, go, db1, db2, dye


def kernel_mask(seed, m: int, f: int, rate: float, bm: int,
                d: int = 0, out_rate: float = 0.0):
    """The exact keep-mask stream the TPU kernels generate — out-mask
    [m, d] first (when ``out_rate > 0``), then the chunked hidden mask
    [m, f] — 0/1 fp32, for on-hardware selfchecks (bench.py) only.
    Returns (hidden_mask, out_mask_or_None)."""

    def kern(seed_ref, o_ref, o2_ref=None):
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        if o2_ref is not None:
            o2_ref[...] = _mask((o2_ref.shape[0], d), out_rate).astype(
                o2_ref.dtype)
        nchunks = _fchunks(f)
        fc = f // nchunks
        for j in range(nchunks):  # consume the stream exactly like fwd/bwd
            sl = slice(j * fc, (j + 1) * fc)
            o_ref[:, sl] = _mask((o_ref.shape[0], fc), rate).astype(
                o_ref.dtype)

    out_specs = [_row_spec(bm, f)]
    out_shape = [jax.ShapeDtypeStruct((m, f), jnp.float32)]
    if out_rate > 0.0:
        out_specs.append(_row_spec(bm, d))
        out_shape.append(jax.ShapeDtypeStruct((m, d), jnp.float32))
    outs = pl.pallas_call(
        kern,
        grid=(m // bm,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
    )(seed)
    if out_rate > 0.0:
        return outs[0], outs[1]
    return outs[0], None


# ---------------------------------------------------------------------------
# XLA fallback (CPU tests / shapes without a clean row block)
# ---------------------------------------------------------------------------


def _fallback_mask(seed, shape, rate, site=0):
    """``site`` separates the hidden (0) and output (1) dropout draws —
    one key for both would make the smaller mask a deterministic prefix of
    the larger (threefry bits are shape-prefix-stable), correlating the two
    dropout sites. Forward and backward must pass the same site per mask."""
    key = jax.random.fold_in(
        jax.random.PRNGKey(seed[0].astype(jnp.uint32)), site
    )
    return jax.random.bernoulli(key, 1.0 - rate, shape)


def _fallback_fwd(x2, w1, b1, w2, b2, seed, rate, out_rate, add_bias2=True):
    prec = _prec(x2.dtype)
    h1 = (jnp.dot(x2, w1, preferred_element_type=jnp.float32, precision=prec)
          + b1).astype(x2.dtype)
    g = _gelu_f32(h1.astype(jnp.float32))
    if rate > 0.0:
        keep = _fallback_mask(seed, g.shape, rate)
        g = jnp.where(keep, g * (1.0 / (1.0 - rate)), 0.0)
    y = jnp.dot(g.astype(x2.dtype), w2, preferred_element_type=jnp.float32,
                precision=prec)
    if add_bias2:
        y = y + b2
    if out_rate > 0.0:
        keep2 = _fallback_mask(seed, y.shape, out_rate, site=1)
        y = jnp.where(keep2, y * (1.0 / (1.0 - out_rate)), 0.0)
    return y.astype(x2.dtype), h1


def _fallback_bwd(dy2, h1, w2, seed, rate, out_rate):
    prec = _prec(dy2.dtype)
    if out_rate > 0.0:
        keep2 = _fallback_mask(seed, dy2.shape, out_rate, site=1)
        dy2 = jnp.where(keep2, dy2.astype(jnp.float32)
                        * (1.0 / (1.0 - out_rate)), 0.0).astype(dy2.dtype)
    h1f = h1.astype(jnp.float32)
    g, dg = _gelu_and_grad_f32(h1f)
    if rate > 0.0:
        keep = _fallback_mask(seed, g.shape, rate)
        scale = 1.0 / (1.0 - rate)
        g = jnp.where(keep, g * scale, 0.0)
        dg = jnp.where(keep, dg * scale, 0.0)
    dh = jax.lax.dot_general(
        dy2, w2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dh1 = dh * dg
    db1 = jnp.sum(dh1, axis=0, keepdims=True)
    db2 = jnp.sum(dy2.astype(jnp.float32), axis=0, keepdims=True)
    return dh1.astype(dy2.dtype), g.astype(dy2.dtype), db1, db2, dy2


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_mlp(x, w1, b1, w2, b2, seed, rate: float, out_rate: float = 0.0,
              add_bias2: bool = True):
    """out_dropout(dropout(GELU_exact(x·W1 + b1))·W2 + b2) with the hidden
    activations never leaving VMEM.

    Args:
      x: [B, N, D] (or [M, D]) activations.
      w1: [D, F]; b1: [F]; w2: [F, D]; b2: [D] — already cast to x.dtype.
      seed: int32 [1] kernel PRNG seed (``dropout_seed``).
      rate: static hidden dropout rate (0.0 → no PRNG use).
      out_rate: static OUTPUT dropout rate — folds the reference MLP's
        trailing dropout site (``vit.py:92-93``) into the same pass.
      add_bias2: static. False under Megatron TP, where each f-shard's
        output is a partial sum and the bias must be added once AFTER the
        psum (by the caller); b2's returned cotangent is then zero — the
        real bias grad flows through the caller's external add.
    Returns:
      [B, N, D] output. Backward regenerates both dropout masks from the
      seed (never stored) and recomputes the dropped activations for dW2.
    """
    y, _ = _fused_mlp_fwd(x, w1, b1, w2, b2, seed, rate, out_rate, add_bias2)
    return y


def _mlp_fwd_impl(x2, w1, b1, w2, b2, seed, rate, out_rate, add_bias2=True):
    """Shard-local forward: block selection runs on the LOCAL row count
    (under a data-sharded mesh each chip sees its own rows), falling back to
    the unfused XLA chain when no clean block divides them."""
    bm = pick_block(x2.shape[0], w1.shape[0], w1.shape[1], x2.dtype.itemsize)
    if bm is None:
        return _fallback_fwd(x2, w1, b1, w2, b2, seed, rate, out_rate,
                             add_bias2)
    return _run_fwd(x2, w1, b1, w2, b2, seed, rate, out_rate, bm, add_bias2)


def _mlp_bwd_impl(dy2, h1, w2, seed, rate, out_rate):
    bm = pick_block(dy2.shape[0], dy2.shape[1], h1.shape[1],
                    dy2.dtype.itemsize)
    if bm is None:
        outs = _fallback_bwd(dy2, h1, w2, seed, rate, out_rate)
    else:
        outs = _run_bwd(dy2, h1, w2, seed, rate, out_rate, bm)
    # dye == dy2 (identity) when out_rate == 0: keep it out of the
    # partitioned outputs so no copy of the upstream grad is materialised
    return outs if out_rate > 0.0 else outs[:4]


@functools.lru_cache(maxsize=None)
def _mlp_fwd_cp(rate, out_rate, add_bias2=True):
    # batch-local under a data-sharded mesh; under Megatron TP the hidden
    # dim is the 'f' factor — w1/b1 column-sharded, w2 row-sharded, h1
    # stays f-sharded as the backward residual and y is psum'd over the
    # factor's axes (the row-parallel reduction). Seed offset =
    # shard_linear_index × local rows ≥ the per-shard stream consumption,
    # same in fwd and bwd.
    return batch_partitioned(
        lambda x2, w1, b1, w2, b2, seed: _mlp_fwd_impl(
            x2, w1, b1, w2, b2, seed, rate, out_rate, add_bias2
        ),
        ({"b": 0}, {"f": 1}, {"f": 1}, {"f": 0}, None, None),
        ({"b": 0}, {"b": 0, "f": 1}),
        seed_arg=5, seed_stride=lambda args: args[0].shape[0],
        psum_outs={0: ("f",)},
    )


@functools.lru_cache(maxsize=None)
def _mlp_bwd_cp(rate, out_rate):
    # db1/db2 are row-reductions accumulated per shard — psum'd over the
    # batch axis inside the partitioned body; under TP db1 stays f-sharded
    # (its param spec is P('model')) and db2 — identical on every f-shard,
    # dy being f-replicated — is returned replicated
    out_batch = ({"b": 0, "f": 1}, {"b": 0, "f": 1}, {"f": 1}, None) + (
        ({"b": 0},) if out_rate > 0.0 else ()
    )
    return batch_partitioned(
        lambda dy2, h1, w2, seed: _mlp_bwd_impl(
            dy2, h1, w2, seed, rate, out_rate
        ),
        ({"b": 0}, {"b": 0, "f": 1}, {"f": 0}, None), out_batch,
        seed_arg=3, seed_stride=lambda args: args[0].shape[0],
        psum_outs={2: ("b",), 3: ("b",)},
    )


def _fused_mlp_fwd(x, w1, b1, w2, b2, seed, rate, out_rate, add_bias2=True):
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    b1r = b1.reshape(1, -1)
    b2r = b2.reshape(1, -1)
    if _on_tpu():
        y, h1 = _mlp_fwd_cp(rate, out_rate, add_bias2)(
            x2, w1, b1r, w2, b2r, seed)
    else:
        y, h1 = _fallback_fwd(x2, w1, b1r, w2, b2r, seed, rate, out_rate,
                              add_bias2)
    return y.reshape(shape), (x2, h1, w1, w2, seed, shape)


def _fused_mlp_bwd(rate, out_rate, add_bias2, res, gy):
    x2, h1, w1, w2, seed, shape = res
    dy2 = gy.reshape(-1, gy.shape[-1]).astype(x2.dtype)
    if _on_tpu():
        outs = _mlp_bwd_cp(rate, out_rate)(dy2, h1, w2, seed)
        if out_rate > 0.0:
            dh1, go, db1, db2, dye = outs
        else:
            (dh1, go, db1, db2), dye = outs, dy2
    else:
        dh1, go, db1, db2, dye = _fallback_bwd(dy2, h1, w2, seed, rate,
                                               out_rate)
    prec = _prec(x2.dtype)
    dx_dtype = (jnp.float32 if os.environ.get("GAVIT_MLP_DX_F32") == "1"
                else x2.dtype)
    dx = jax.lax.dot_general(  # dh1 · W1ᵀ — output dtype matches x (no
        # separate convert pass; bf16 GEMMs still accumulate fp32 on the MXU)
        dh1, w1, (((1,), (1,)), ((), ())),
        preferred_element_type=dx_dtype, precision=prec,
    ).astype(x2.dtype)
    dw1 = jax.lax.dot_general(  # xᵀ · dh1 (contract rows)
        x2, dh1, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(w1.dtype)
    dw2 = jax.lax.dot_general(  # goᵀ · dy_eff
        go, dye, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(w2.dtype)
    db2_out = db2.reshape(-1).astype(w2.dtype)
    if not add_bias2:
        # b2 never entered the forward (the caller adds it post-psum and
        # its grad flows through that external add) — zero cotangent here
        db2_out = jnp.zeros_like(db2_out)
    return (dx.reshape(shape), dw1, db1.reshape(-1).astype(w1.dtype),
            dw2, db2_out, None)


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


# ---------------------------------------------------------------------------
# deterministic (inference) megakernel
# ---------------------------------------------------------------------------


def _gelu_tanh_f32(x):
    c = 0.7978845608028654  # sqrt(2/pi)
    u = c * (x + 0.044715 * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(u))


def _mlp_infer_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref, *,
                      approximate: bool):
    prec = _prec(x_ref.dtype)
    x = x_ref[...]
    h1 = (jax.lax.dot_general(
        x, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) + b1_ref[...]).astype(x.dtype)
    h1 = h1.astype(jnp.float32)
    g = _gelu_tanh_f32(h1) if approximate else _gelu_f32(h1)
    y = jax.lax.dot_general(
        g.astype(x.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) + b2_ref[...]
    y_ref[...] = y.astype(y_ref.dtype)


def _chain_infer(x2, w1, b1, w2, b2, approximate):
    prec = _prec(x2.dtype)
    h1 = (jnp.dot(x2, w1, preferred_element_type=jnp.float32, precision=prec)
          + b1).astype(x2.dtype)
    g = jax.nn.gelu(h1.astype(jnp.float32), approximate=approximate)
    return (jnp.dot(g.astype(x2.dtype), w2,
                    preferred_element_type=jnp.float32, precision=prec)
            + b2).astype(x2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_mlp_inference(x, w1, b1, w2, b2, approximate: bool = True):
    """GELU(x·W1+b1)·W2+b2 with the hidden activations VMEM-resident — the
    deterministic (serving) twin of :func:`fused_mlp`. Removes the
    [M, hidden] HBM write+read pair per layer (~0.38 ms/layer at ViT-B b64).

    ``approximate=True`` uses the tanh GELU (measured fastest forward-only;
    BASELINE.md r2) — the bf16 serving form; exact-erf when False. The VJP
    recomputes through the XLA chain (Grad-CAM's token-probe gradients are
    not a serving hot path)."""
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    b1r, b2r = b1.reshape(1, -1), b2.reshape(1, -1)
    if not _on_tpu():
        return _chain_infer(x2, w1, b1r, w2, b2r, approximate).reshape(shape)
    return _mlp_infer_cp(approximate)(x2, w1, b1r, w2, b2r).reshape(shape)


@functools.lru_cache(maxsize=None)
def _mlp_infer_cp(approximate):
    return batch_partitioned(
        lambda x2, w1, b1, w2, b2: _mlp_infer_impl(
            x2, w1, b1, w2, b2, approximate
        ),
        (0, None, None, None, None), (0,),
    )


def _mlp_infer_impl(x2, w1, b1r, w2, b2r, approximate):
    bm = pick_block(x2.shape[0], w1.shape[0], w1.shape[1], x2.dtype.itemsize)
    if bm is None:
        return _chain_infer(x2, w1, b1r, w2, b2r, approximate)
    m, d = x2.shape
    f = w1.shape[1]
    y = pl.pallas_call(
        functools.partial(_mlp_infer_kernel, approximate=approximate),
        grid=(m // bm,),
        in_specs=[
            _row_spec(bm, d),
            _const_spec((d, f)),
            _const_spec((1, f)),
            _const_spec((f, d)),
            _const_spec((1, d)),
        ],
        out_specs=_row_spec(bm, d),
        out_shape=jax.ShapeDtypeStruct((m, d), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=vmem_limit_for(bm, d, f, x2.dtype.itemsize),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * d * f,
            bytes_accessed=(2 * m * d + 2 * d * f) * x2.dtype.itemsize,
            transcendentals=m * f,
        ),
    )(x2, w1, b1r, w2, b2r)
    return y


def _fmi_fwd(x, w1, b1, w2, b2, approximate):
    return (fused_mlp_inference(x, w1, b1, w2, b2, approximate),
            (x, w1, b1, w2, b2))


def _fmi_bwd(approximate, res, gy):
    x, w1, b1, w2, b2 = res
    shape = x.shape
    x2 = x.reshape(-1, shape[-1])
    gy2 = gy.reshape(-1, gy.shape[-1])

    def chain(x2, w1, b1, w2, b2):
        return _chain_infer(x2, w1, b1.reshape(1, -1), w2, b2.reshape(1, -1),
                            approximate)

    _, vjp = jax.vjp(chain, x2, w1, b1, w2, b2)
    dx, dw1, db1, dw2, db2 = vjp(gy2.astype(x2.dtype))
    return dx.reshape(shape), dw1, db1, dw2, db2


fused_mlp_inference.defvjp(_fmi_fwd, _fmi_bwd)
