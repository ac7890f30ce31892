"""Multi-head self-attention for TPU.

Interchangeable paths (selected by ``impl``):

* ``"reference"`` — plain XLA einsum attention that materialises the
  ``[B, H, N, N]`` probability matrix. Mirrors the math of the PyTorch
  reference (``/root/reference/src/models/vit.py:55-72``: softmax(q·kᵀ·scale)·v)
  and is the ground truth the Pallas kernels are tested against. Supports
  attention-probability dropout and probability capture.

* ``"xla"`` — jax.nn.dot_product_attention (comparison/fallback).

* ``"pallas"`` (default on the model's hot path, via
  :func:`fused_qkv_attention` / :func:`fused_attention_v2`) — fused one-pass
  Pallas kernels: one program **per image** with all heads resident in VMEM,
  scores never round-trip to HBM, fp32 softmax, and a custom VJP implements
  the flash-attention backward (probabilities recomputed, nothing stored).
  The ragged ViT sequence (N=197 at 224px, 577 at 384px) runs unpadded —
  Mosaic masks the internal tile edges; an op-level v5e profile showed
  host-side pad/slice around padded kernels cost more than they saved
  (BASELINE.md).

Kernel generations on the pallas path (each measured; see BASELINE.md):
v1 per-(batch·head) padded programs — kept for the [B,H,N,d] dispatcher API
and as a cross-check implementation; v2 per-image unpadded programs; v3
packed-QKV single-transpose layout; **v4** (default at 224px) consumes the
raw ``[B, N, 3·H·d]`` qkv-GEMM rows and carves per-head q/k/v as static lane
slices in VMEM, so the QKV relayout never exists in HBM; **v5**
(:func:`flash_attention_large`) is the KV-blockwise online-softmax path with
O(block²) VMEM for sequence lengths past the exact kernels' VMEM cliff
(N ≈ 800) — dispatchers switch automatically.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gavit_tpu.parallel.op_sharding import (batch_partitioned_cached,
                                            head_partitioned_cached,
                                            tp_axis_in_context)

_LANE = 128
_NEG_INF = -1e30


def _prec(dtype):
    """HIGHEST for fp32 inputs (parity bar), fast default for bf16."""
    if dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# reference (XLA einsum) path
# ---------------------------------------------------------------------------


def attention_reference(
    q, k, v, scale, dropout_rate=0.0, dropout_rng=None, return_probs=False
):
    """softmax(q kᵀ · scale) v with optional probability dropout.

    Args:
      q, k, v: [B, H, N, d]
    Returns:
      [B, H, N, d] in q.dtype, with fp32 softmax — and the [B, H, N, N]
      probabilities too when ``return_probs`` (interpretability capture).
    """
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32,
        precision=_prec(q.dtype),
    ) * scale
    p = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32, precision=_prec(v.dtype),
    )
    out = out.astype(q.dtype)
    if return_probs:
        return out, p
    return out


# ---------------------------------------------------------------------------
# pallas fused path
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, n_valid: int):
    # native-dtype MXU dots (bf16 stays bf16 on the MXU), fp32 accumulation;
    # fp32 inputs force a HIGHEST-precision pass to hold the parity bar
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    prec = _prec(q.dtype)
    n_pad = q.shape[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    s = jnp.where(col < n_valid, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p * pl.reciprocal(l, approx=False)
    o_ref[0] = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32, precision=prec
    ).astype(o_ref.dtype)


def _bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale: float, n_valid: int
):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    prec = _prec(q.dtype)
    n_pad = q.shape[0]
    # recompute probabilities (flash-style: never stored to HBM)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    s = jnp.where(col < n_valid, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p * pl.reciprocal(l, approx=False)
    # padded query rows produce garbage grads; zero them so dk/dv stay exact
    row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
    p = jnp.where(row < n_valid, p, 0.0)

    dv = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32, precision=prec)
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _bh_specs(n: int, n_pad: int, d: int, count: int):
    """Block specs mapping grid step i → (batch·head) slice [1, n_pad, d]."""
    return [
        pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        for _ in range(count)
    ]


def _pad_tokens(x, n_pad):
    n = x.shape[-2]
    if n == n_pad:
        return x
    pad = [(0, 0)] * x.ndim
    pad[-2] = (0, n_pad - n)
    return jnp.pad(x, pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_attention(q, k, v, scale):
    return _fused_attention_fwd(q, k, v, scale)[0]


def _run_fwd(q, k, v, scale):
    # head_partitioned: under a data-sharded mesh the kernel runs on each
    # chip's local rows instead of GSPMD replicating the opaque Mosaic call
    # (which would all-gather the global batch), and under tensor
    # parallelism it runs on each chip's local heads — heads are
    # embarrassingly parallel in MHSA (see parallel/op_sharding.py)
    return head_partitioned_cached(
        _run_fwd_v1_impl, ((0, 1),) * 3, ((0, 1),), scale
    )(q, k, v)


def _run_fwd_v1_impl(q, k, v, scale):
    b, h, n, d = q.shape
    n_pad = max(_round_up(n, _LANE), _LANE)
    qf = _pad_tokens(q, n_pad).reshape(b * h, n_pad, d)
    kf = _pad_tokens(k, n_pad).reshape(b * h, n_pad, d)
    vf = _pad_tokens(v, n_pad).reshape(b * h, n_pad, d)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_valid=n),
        grid=(b * h,),
        in_specs=_bh_specs(n, n_pad, d, 3),
        out_specs=pl.BlockSpec(
            (1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_pad * n_pad * d,
            bytes_accessed=4 * b * h * n_pad * d * 4,
            transcendentals=b * h * n_pad * n_pad,
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, n_pad, d)[:, :, :n, :]


def _fused_attention_fwd(q, k, v, scale):
    out = _run_fwd(q, k, v, scale)
    return out, (q, k, v)


def _fused_attention_bwd(scale, res, g):
    q, k, v = res
    return head_partitioned_cached(
        _run_bwd_v1_impl, ((0, 1),) * 4, ((0, 1),) * 3, scale
    )(q, k, v, g)


def _run_bwd_v1_impl(q, k, v, g, scale):
    b, h, n, d = q.shape
    n_pad = max(_round_up(n, _LANE), _LANE)
    qf = _pad_tokens(q, n_pad).reshape(b * h, n_pad, d)
    kf = _pad_tokens(k, n_pad).reshape(b * h, n_pad, d)
    vf = _pad_tokens(v, n_pad).reshape(b * h, n_pad, d)
    gf = _pad_tokens(g, n_pad).reshape(b * h, n_pad, d)
    shapes = [jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype) for _ in range(3)]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_valid=n),
        grid=(b * h,),
        in_specs=_bh_specs(n, n_pad, d, 4),
        out_specs=[
            pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_shape=shapes,
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=11 * b * h * n_pad * n_pad * d,
            bytes_accessed=7 * b * h * n_pad * d * 4,
            transcendentals=b * h * n_pad * n_pad,
        ),
    )(qf, kf, vf, gf)

    def unpad(x):
        return x.reshape(b, h, n_pad, d)[:, :, :n, :]

    return unpad(dq), unpad(dk), unpad(dv)


_fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)


def attention_pallas(q, k, v, scale):
    """Fused MHSA: [B, H, N, d] → [B, H, N, d]."""
    n, d = q.shape[-2], q.shape[-1]
    # the v1 kernel pads tokens to the 128-lane multiple before running, so
    # the VMEM estimate must use the PADDED length (n=700 fits unpadded but
    # its 768-padded score buffers would not)
    n_pad = max(_round_up(n, _LANE), _LANE)
    if not _v3_fits(n_pad, d, q.dtype.itemsize):
        return flash_attention_large(q, k, v, scale)
    return _fused_attention(q, k, v, scale)


# ---------------------------------------------------------------------------
# pallas fused path v2: per-image programs, all heads in-program, no padding
# ---------------------------------------------------------------------------
#
# Profiling on v5e (BASELINE.md) showed the v1 kernel's cost was dominated by
# data movement the op itself induced: host-level pad(197→256)/slice around
# every call (≈19 ms/step at ViT-B b128) and a (B·H)-program grid whose tiny
# per-program DMAs ran at 297 GB/s. v2 keeps the [B, H, N, d] layout but uses
# one program per image with all H heads resident in VMEM (one ~900 KB DMA),
# indexes heads on the leading (register) dim — Mosaic-friendly — and runs
# the ragged N=197 directly (Mosaic masks the internal tiles; no host pads).


def _fwd_kernel_v2(q_ref, k_ref, v_ref, o_ref, *, scale: float, heads: int):
    prec = _prec(q_ref.dtype)
    for h in range(heads):  # heads in this block (may be a chunk of the model's H)
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p * pl.reciprocal(l, approx=False)
        o_ref[0, h] = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(o_ref.dtype)


def _bwd_kernel_v2(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
    *, scale: float, heads: int,
):
    prec = _prec(q_ref.dtype)
    for h in range(heads):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        do = do_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p * pl.reciprocal(l, approx=False)

        dv = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32, precision=prec)
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dq_ref[0, h] = dq.astype(dq_ref.dtype)
        dk_ref[0, h] = dk.astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)


def _img_specs(hc, n, d, count):
    return [
        pl.BlockSpec((1, hc, n, d), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM)
        for _ in range(count)
    ]


_VMEM_BUDGET = 12 * 1024 * 1024  # leave headroom under the 16 MB scoped limit


def _head_chunk(h: int, n: int, d: int, itemsize: int, n_refs: int,
                n_score_bufs: int) -> int:
    """Largest divisor of H whose per-program VMEM estimate fits the budget.

    Estimate: ref blocks double-buffered + fp32 [N,N] score intermediates.
    At 224px (N=197) all 12 ViT-B heads fit in one program; at 384px (N=577)
    the backward pass needs head chunks (the full-H version exceeds the 16 MB
    scoped VMEM by a few hundred KB — measured, BASELINE.md).
    """
    score_bytes = n_score_bufs * n * n * 4
    for hc in sorted((c for c in range(1, h + 1) if h % c == 0), reverse=True):
        est = 2 * n_refs * hc * n * d * itemsize + score_bytes
        if est <= _VMEM_BUDGET:
            return hc
    return 1


def _run_fwd_v2(q, k, v, scale):
    return head_partitioned_cached(
        _run_fwd_v2_impl, ((0, 1),) * 3, ((0, 1),), scale
    )(q, k, v)


def _run_fwd_v2_impl(q, k, v, scale):
    b, h, n, d = q.shape
    hc = _head_chunk(h, n, d, q.dtype.itemsize, n_refs=4, n_score_bufs=2)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_v2, scale=scale, heads=hc),
        grid=(b, h // hc),
        in_specs=_img_specs(hc, n, d, 3),
        out_specs=pl.BlockSpec((1, hc, n, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), q.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=4 * b * h * n * d * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention_v2(q, k, v, scale):
    """MHSA over [B, H, N, d], per-image fused programs, unpadded."""
    return _run_fwd_v2(q, k, v, scale)


def _fa2_fwd(q, k, v, scale):
    return _run_fwd_v2(q, k, v, scale), (q, k, v)


def _fa2_bwd(scale, res, g):
    q, k, v = res
    return head_partitioned_cached(
        _run_bwd_v2_impl, ((0, 1),) * 4, ((0, 1),) * 3, scale
    )(q, k, v, g)


def _run_bwd_v2_impl(q, k, v, g, scale):
    b, h, n, d = q.shape
    hc = _head_chunk(h, n, d, q.dtype.itemsize, n_refs=7, n_score_bufs=5)
    shapes = [jax.ShapeDtypeStruct((b, h, n, d), q.dtype) for _ in range(3)]
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_v2, scale=scale, heads=hc),
        grid=(b, h // hc),
        in_specs=_img_specs(hc, n, d, 4),
        out_specs=_img_specs(hc, n, d, 3),
        out_shape=shapes,
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=11 * b * h * n * n * d,
            bytes_accessed=7 * b * h * n * d * q.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(q, k, v, g)
    return dq, dk, dv


fused_attention_v2.defvjp(_fa2_fwd, _fa2_bwd)


def _fwd_kernel_v3(qkv_ref, o_ref, *, scale: float, heads: int):
    # qkv_ref block: [1, 3, hc, N, d] — plane/head are leading (register)
    # dims, freely indexable; (N, d) carry the vector layout
    prec = _prec(qkv_ref.dtype)
    for h in range(heads):
        q = qkv_ref[0, 0, h]
        k = qkv_ref[0, 1, h]
        v = qkv_ref[0, 2, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p * pl.reciprocal(l, approx=False)
        o_ref[0, h] = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(o_ref.dtype)


def _bwd_kernel_v3(qkv_ref, do_ref, dqkv_ref, *, scale: float, heads: int):
    prec = _prec(qkv_ref.dtype)
    for h in range(heads):
        q = qkv_ref[0, 0, h]
        k = qkv_ref[0, 1, h]
        v = qkv_ref[0, 2, h]
        do = do_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p * pl.reciprocal(l, approx=False)
        dv = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32, precision=prec)
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dqkv_ref[0, 0, h] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, 1, h] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, 2, h] = dv.astype(dqkv_ref.dtype)


def _qkv_spec(hc, n, d):
    return pl.BlockSpec((1, 3, hc, n, d), lambda i, j: (i, 0, j, 0, 0),
                        memory_space=pltpu.VMEM)


def _out_spec(hc, n, d):
    return pl.BlockSpec((1, hc, n, d), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _fused_qkv5(qkv5, scale):
    """[B, 3, H, N, d] → [B, H, N, d], one program per (image, head-chunk)."""
    return _run_fwd_v3(qkv5, scale)


def _run_fwd_v3(qkv5, scale):
    # heads on dim 2 of [B, 3, H, N, d] → dim 1 of the [B, H, N, d] output
    return head_partitioned_cached(
        _run_fwd_v3_impl, ((0, 2),), ((0, 1),), scale
    )(qkv5)


def _run_fwd_v3_impl(qkv5, scale):
    b, three, h, n, d = qkv5.shape
    hc = _head_chunk(h, n, d, qkv5.dtype.itemsize, n_refs=4, n_score_bufs=2)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_v3, scale=scale, heads=hc),
        grid=(b, h // hc),
        in_specs=[_qkv_spec(hc, n, d)],
        out_specs=_out_spec(hc, n, d),
        out_shape=jax.ShapeDtypeStruct((b, h, n, d), qkv5.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n * n * d,
            bytes_accessed=4 * b * h * n * d * qkv5.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(qkv5)


def _fqkv5_fwd(qkv5, scale):
    return _run_fwd_v3(qkv5, scale), qkv5


def _fqkv5_bwd(scale, qkv5, g):
    return (head_partitioned_cached(
        _run_bwd_v3_impl, ((0, 2), (0, 1)), ((0, 2),), scale
    )(qkv5, g),)


def _run_bwd_v3_impl(qkv5, g, scale):
    b, three, h, n, d = qkv5.shape
    hc = _head_chunk(h, n, d, qkv5.dtype.itemsize, n_refs=7, n_score_bufs=5)
    dqkv5 = pl.pallas_call(
        functools.partial(_bwd_kernel_v3, scale=scale, heads=hc),
        grid=(b, h // hc),
        in_specs=[_qkv_spec(hc, n, d), _out_spec(hc, n, d)],
        out_specs=_qkv_spec(hc, n, d),
        out_shape=jax.ShapeDtypeStruct((b, 3, h, n, d), qkv5.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=11 * b * h * n * n * d,
            bytes_accessed=7 * b * h * n * d * qkv5.dtype.itemsize,
            transcendentals=b * h * n * n,
        ),
    )(qkv5, g)
    return dqkv5


_fused_qkv5.defvjp(_fqkv5_fwd, _fqkv5_bwd)


def _fwd_kernel_v4(qkv_ref, o_ref, *, scale: float, heads: int, d: int):
    # qkv_ref block: [1, N, 3·H·d] — the qkv GEMM's raw output row. Heads
    # are carved out as static 64-lane slices IN VMEM, so the
    # [B,N,3,H,d]→[B,3,H,N,d] relayout never exists in HBM (profiled at
    # ≈20 ms/step fwd+bwd at ViT-B b128 — the single largest non-GEMM cost).
    prec = _prec(qkv_ref.dtype)
    x = qkv_ref[0]
    for h in range(heads):
        q = x[:, h * d:(h + 1) * d]
        k = x[:, (heads + h) * d:(heads + h + 1) * d]
        v = x[:, (2 * heads + h) * d:(2 * heads + h + 1) * d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p * pl.reciprocal(l, approx=False)
        o_ref[0, h] = jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32,
            precision=prec,
        ).astype(o_ref.dtype)


def _bwd_kernel_v4(qkv_ref, do_ref, dqkv_ref, *, scale: float, heads: int,
                   d: int):
    prec = _prec(qkv_ref.dtype)
    x = qkv_ref[0]
    for h in range(heads):
        q = x[:, h * d:(h + 1) * d]
        k = x[:, (heads + h) * d:(heads + h + 1) * d]
        v = x[:, (2 * heads + h) * d:(2 * heads + h + 1) * d]
        do = do_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p * pl.reciprocal(l, approx=False)
        dv = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32, precision=prec)
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dqkv_ref[0, :, h * d:(h + 1) * d] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, (heads + h) * d:(heads + h + 1) * d] = (
            dk.astype(dqkv_ref.dtype))
        dqkv_ref[0, :, (2 * heads + h) * d:(2 * heads + h + 1) * d] = (
            dv.astype(dqkv_ref.dtype))


def _flat_spec(n, f):
    return pl.BlockSpec((1, n, f), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _v4_fits(h, n, d, itemsize, fwd_only: bool = False) -> bool:
    """The v4 program(s) must fit the scoped-VMEM budget with the full
    [N, 3·H·d] row resident (the row cannot be head-chunked — q/k/v lanes
    interleave across the whole row). ``fwd_only`` checks just the forward
    program: at 384px the forward fits (≈9.8 MB) while the backward does
    not, so deterministic (inference) calls keep the relayout-free path."""
    row = n * 3 * h * d * itemsize
    out = h * n * d * itemsize
    fwd = 2 * (row + out) + 2 * n * n * 4
    if fwd_only:
        return fwd <= _VMEM_BUDGET
    bwd = 2 * (row + out + row) + 5 * n * n * 4
    return max(fwd, bwd) <= _VMEM_BUDGET


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _fused_qkv_flat(qkv3, scale, heads, d):
    """[B, N, 3·H·d] (raw qkv GEMM output) → [B, H, N, d]."""
    return _run_fwd_v4(qkv3, scale, heads, d)


def _run_fwd_v4(qkv3, scale, heads, d):
    return batch_partitioned_cached(
        _run_fwd_v4_impl, 1, 1, scale, heads, d
    )(qkv3)


def _run_fwd_v4_impl(qkv3, scale, heads, d):
    b, n, f = qkv3.shape
    return pl.pallas_call(
        functools.partial(_fwd_kernel_v4, scale=scale, heads=heads, d=d),
        grid=(b,),
        in_specs=[_flat_spec(n, f)],
        out_specs=pl.BlockSpec((1, heads, n, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, heads, n, d), qkv3.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * n * n * d,
            bytes_accessed=4 * b * heads * n * d * qkv3.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
    )(qkv3)


def _fqkv_flat_fwd(qkv3, scale, heads, d):
    return _run_fwd_v4(qkv3, scale, heads, d), qkv3


def _fqkv_flat_bwd(scale, heads, d, qkv3, g):
    return (batch_partitioned_cached(
        _run_bwd_v4_impl, 2, 1, scale, heads, d
    )(qkv3, g),)


def _run_bwd_v4_impl(qkv3, g, scale, heads, d):
    b, n, f = qkv3.shape
    if not _v4_fits(heads, n, d, qkv3.dtype.itemsize):
        # the forward ran v4 under fwd_only (deterministic inference), but
        # something differentiated through it anyway (e.g. Grad-CAM's
        # token-probe VJP at 384px) — the flat-row backward does not fit
        # scoped VMEM there, so route through the head-chunked v3 backward
        # (the raw impl: this already runs inside the partitioned body)
        qkv5 = qkv3.reshape(b, n, 3, heads, d).transpose(0, 2, 3, 1, 4)
        dqkv5 = _run_bwd_v3_impl(qkv5, g, scale)
        return dqkv5.transpose(0, 3, 1, 2, 4).reshape(b, n, f)
    dqkv3 = pl.pallas_call(
        functools.partial(_bwd_kernel_v4, scale=scale, heads=heads, d=d),
        grid=(b,),
        in_specs=[
            _flat_spec(n, f),
            pl.BlockSpec((1, heads, n, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=_flat_spec(n, f),
        out_shape=jax.ShapeDtypeStruct((b, n, f), qkv3.dtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=11 * b * heads * n * n * d,
            bytes_accessed=7 * b * heads * n * d * qkv3.dtype.itemsize,
            transcendentals=b * heads * n * n,
        ),
    )(qkv3, g)
    return dqkv3


_fused_qkv_flat.defvjp(_fqkv_flat_fwd, _fqkv_flat_bwd)


def fused_qkv_attention(qkv, scale, merge_heads: bool = True,
                        fwd_only: bool = False):
    """MHSA on the packed projection: [B, N, 3, H, d] → [B, N, H, d]
    (or raw [B, H, N, d] with ``merge_heads=False`` — the caller's output
    projection can contract (h, d) directly and skip the relayout).

    Preferred path (v4): the kernel consumes the qkv GEMM's raw
    [B, N, 3·H·d] rows and carves per-head q/k/v as static lane slices in
    VMEM — no host-side relayout at all (the v3 fused transpose + its
    backward inverse profiled at ≈20 ms/step at ViT-B b128). Falls back to
    the v3 transposed layout when the full row doesn't fit the scoped-VMEM
    budget (384px backward — pass ``fwd_only=True`` on deterministic
    inference calls, where only the forward program has to fit, to keep the
    relayout-free path up to larger N).
    """
    b, n, three, h, d = qkv.shape
    # Under tensor parallelism the v4 flat form is unusable: reshaping the
    # head-sharded [B,N,3,H,d] into [B,N,3·H·d] folds the sharded dim away
    # (GSPMD would all-gather). The v3 transposed form keeps heads on an
    # explicit dim, so each chip runs its local heads
    # (parallel/op_sharding.py::head_partitioned_cached).
    tp = tp_axis_in_context()
    if not tp and _v4_fits(h, n, d, qkv.dtype.itemsize, fwd_only=fwd_only):
        out = _fused_qkv_flat(qkv.reshape(b, n, 3 * h * d), scale, h, d)
    elif _v3_fits(n, d, qkv.dtype.itemsize):
        qkv5 = qkv.transpose(0, 2, 3, 1, 4)  # [B, 3, H, N, d]
        out = _fused_qkv5(qkv5, scale)  # [B, H, N, d]
    else:
        # exact full-[N,N] kernels no longer fit VMEM — blockwise flash.
        # (Batch-partitioned only: its saved LSE carries a folded b·h dim
        # the factor rules cannot split, so under TP at N>800 the heads
        # replicate — correct, just not head-parallel. Corner case.)
        qkv5 = qkv.transpose(2, 0, 3, 1, 4)  # [3, B, H, N, d]
        out = flash_attention_large(qkv5[0], qkv5[1], qkv5[2], scale)
    if merge_heads:
        return out.transpose(0, 2, 1, 3)
    return out


# ---------------------------------------------------------------------------
# pallas fused path v5: KV-blockwise flash attention for large N
# ---------------------------------------------------------------------------
#
# The v2/v3/v4 kernels hold full fp32 [N, N] score intermediates per head:
# exact at this model family's sequence lengths (N=197/577) and measured
# faster than blockwise at those sizes (the saved-LSE flash backward lost
# 0.37 ms/step at N=197 — BASELINE.md), but the VMEM estimate walks off the
# 16 MB cliff near N≈800 even at one head per program. v5 is the
# asymptotic path: an online-softmax forward that saves the LSE, and a
# two-kernel backward (dq accumulated over KV blocks; dk/dv accumulated over
# Q blocks) whose VMEM footprint is O(block²) regardless of N. Dispatchers
# switch to it automatically when the exact kernels stop fitting.

_V5_BLOCK = 256
_V5_LANES = 128  # m/l/lse carried 128-wide (Mosaic minor-dim tile)


def _v5_mask_cols(s, j, bk, n_valid):
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * bk
    return jnp.where(col < n_valid, s, _NEG_INF)


def _fwd_kernel_v5(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                   *, scale: float, n_valid: int):
    j = pl.program_id(2)
    bk = k_ref.shape[1]
    d = q_ref.shape[2]
    prec = _prec(q_ref.dtype)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, _NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) * scale
    s = _v5_mask_cols(s, j, bk, n_valid)

    m_prev = m_scr[...]                                   # [bq, 128]
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)            # [bq, 1]
    m_next = jnp.maximum(m_prev, m_curr)                  # [bq, 128]
    p = jnp.exp(s - jnp.tile(m_next, (1, bk // _V5_LANES)))
    alpha = jnp.exp(m_prev - m_next)                      # [bq, 128]
    l_corr = alpha * l_prev
    l_next = jnp.sum(p, axis=1, keepdims=True) + l_corr   # [bq, 128]
    m_scr[...] = m_next
    l_scr[...] = l_next
    l_inv = jnp.where(l_next == 0.0, 1.0, 1.0 / l_next)
    bcast = (lambda x: x[:, :d]) if d < _V5_LANES else (
        lambda x: jnp.tile(x, (1, d // _V5_LANES)))
    acc_scr[...] *= bcast(l_corr * l_inv)
    v = v_ref[0]
    acc_scr[...] += jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32,
        precision=prec,
    ) * bcast(l_inv)

    @pl.when(j == pl.num_programs(2) - 1)
    def _store():
        o_ref[0] = acc_scr[...].astype(o_ref.dtype)
        lse_ref[0] = m_scr[...] + jnp.log(
            jnp.where(l_scr[...] == 0.0, 1.0, l_scr[...])
        )


def _dq_kernel_v5(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                  dq_scr, *, scale: float, n_valid: int):
    j = pl.program_id(2)
    bk = k_ref.shape[1]
    prec = _prec(q_ref.dtype)

    @pl.when(j == 0)
    def _init():
        dq_scr[...] = jnp.zeros(dq_scr.shape, jnp.float32)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) * scale
    s = _v5_mask_cols(s, j, bk, n_valid)
    # lse-normalised probabilities: exp(s - lse) = exp(s - m)/l; lse/delta
    # arrive 128-wide (all lanes equal) and are tiled to the block width
    rep = bk // _V5_LANES
    p = jnp.exp(s - jnp.tile(lse_ref[0], (1, rep)))
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    ds = (p * (dp - jnp.tile(delta_ref[0], (1, rep))) * scale).astype(q.dtype)
    dq_scr[...] += jax.lax.dot(
        ds, k, preferred_element_type=jnp.float32, precision=prec
    )

    @pl.when(j == pl.num_programs(2) - 1)
    def _store():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


def _dkv_kernel_v5(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dk_ref, dv_ref, dk_scr, dv_scr, *, scale: float,
                   n_valid: int):
    j = pl.program_id(1)  # kv block (parallel)
    i = pl.program_id(2)  # q block (arbitrary, accumulated)
    bq = q_ref.shape[1]
    bk = k_ref.shape[1]
    prec = _prec(q_ref.dtype)

    @pl.when(i == 0)
    def _init():
        dk_scr[...] = jnp.zeros(dk_scr.shape, jnp.float32)
        dv_scr[...] = jnp.zeros(dv_scr.shape, jnp.float32)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ) * scale
    s = _v5_mask_cols(s, j, bk, n_valid)
    rep = bk // _V5_LANES
    p = jnp.exp(s - jnp.tile(lse_ref[0], (1, rep)))
    # padded query rows carry garbage lse — zero their probability rows so
    # dk/dv stay exact (mirrors the v1 kernel's row masking)
    row = jax.lax.broadcasted_iota(jnp.int32, p.shape, 0) + i * bq
    p = jnp.where(row < n_valid, p, 0.0)
    dv_scr[...] += jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    ds = (p * (dp - jnp.tile(delta_ref[0], (1, rep))) * scale).astype(q.dtype)
    dk_scr[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )

    @pl.when(i == pl.num_programs(2) - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _v5_sizes(n: int):
    block = min(_V5_BLOCK, max(_round_up(n, _V5_LANES), _V5_LANES))
    n_pad = _round_up(n, block)
    return block, n_pad


def _v5_params():
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary")
    )


def _run_fwd_v5(q, k, v, scale):
    return batch_partitioned_cached(_run_fwd_v5_impl, 3, 2, scale)(q, k, v)


def _run_fwd_v5_impl(q, k, v, scale):
    b, h, n, d = q.shape
    blk, n_pad = _v5_sizes(n)
    nq = nk = n_pad // blk
    qf = _pad_tokens(q, n_pad).reshape(b * h, n_pad, d)
    kf = _pad_tokens(k, n_pad).reshape(b * h, n_pad, d)
    vf = _pad_tokens(v, n_pad).reshape(b * h, n_pad, d)
    qspec = pl.BlockSpec((1, blk, d), lambda b_, i, j: (b_, i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, blk, d), lambda b_, i, j: (b_, j, 0),
                         memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_v5, scale=scale, n_valid=n),
        grid=(b * h, nq, nk),
        in_specs=[qspec, kspec, kspec],
        out_specs=[
            qspec,
            pl.BlockSpec((1, blk, _V5_LANES), lambda b_, i, j: (b_, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, n_pad, _V5_LANES), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk, _V5_LANES), jnp.float32),
            pltpu.VMEM((blk, _V5_LANES), jnp.float32),
            pltpu.VMEM((blk, d), jnp.float32),
        ],
        compiler_params=_v5_params(),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * n_pad * n_pad * d,
            bytes_accessed=4 * b * h * n_pad * d * q.dtype.itemsize,
            transcendentals=b * h * n_pad * n_pad,
        ),
    )(qf, kf, vf)
    return o.reshape(b, h, n_pad, d)[:, :, :n, :], lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_large(q, k, v, scale):
    """KV-blockwise MHSA over [B, H, N, d] — the N-scalable path."""
    return _run_fwd_v5(q, k, v, scale)[0]


def _fa5_fwd(q, k, v, scale):
    o, lse = _run_fwd_v5(q, k, v, scale)
    return o, (q, k, v, o, lse)


def _fa5_bwd(scale, res, g):
    q, k, v, o, lse = res
    return batch_partitioned_cached(
        _run_bwd_v5_impl, 6, 3, scale
    )(q, k, v, o, lse, g)


def _run_bwd_v5_impl(q, k, v, o, lse, g, scale):
    b, h, n, d = q.shape
    blk, n_pad = _v5_sizes(n)
    nq = nk = n_pad // blk
    qf = _pad_tokens(q, n_pad).reshape(b * h, n_pad, d)
    kf = _pad_tokens(k, n_pad).reshape(b * h, n_pad, d)
    vf = _pad_tokens(v, n_pad).reshape(b * h, n_pad, d)
    gf = _pad_tokens(g, n_pad).reshape(b * h, n_pad, d)
    # delta = rowsum(do ⊙ o): one cheap fused XLA pass, fed 128-wide like lse
    delta = jnp.sum(
        g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True
    )
    delta = _pad_tokens(delta, n_pad).reshape(b * h, n_pad, 1)
    delta = jnp.broadcast_to(delta, (b * h, n_pad, _V5_LANES))

    dspec = pl.BlockSpec((1, blk, d), lambda b_, i, j: (b_, i, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, blk, d), lambda b_, i, j: (b_, j, 0),
                          memory_space=pltpu.VMEM)
    lm_q = pl.BlockSpec((1, blk, _V5_LANES), lambda b_, i, j: (b_, i, 0),
                        memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel_v5, scale=scale, n_valid=n),
        grid=(b * h, nq, nk),
        in_specs=[dspec, kvspec, kvspec, dspec, lm_q, lm_q],
        out_specs=dspec,
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((blk, d), jnp.float32)],
        compiler_params=_v5_params(),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * n_pad * n_pad * d,
            bytes_accessed=5 * b * h * n_pad * d * q.dtype.itemsize,
            transcendentals=b * h * n_pad * n_pad,
        ),
    )(qf, kf, vf, gf, lse, delta)

    # dk/dv: kv blocks parallel, q blocks accumulated (innermost)
    q_in = pl.BlockSpec((1, blk, d), lambda b_, j, i: (b_, i, 0),
                        memory_space=pltpu.VMEM)
    kv_in = pl.BlockSpec((1, blk, d), lambda b_, j, i: (b_, j, 0),
                         memory_space=pltpu.VMEM)
    lm_in = pl.BlockSpec((1, blk, _V5_LANES), lambda b_, j, i: (b_, i, 0),
                         memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel_v5, scale=scale, n_valid=n),
        grid=(b * h, nk, nq),
        in_specs=[q_in, kv_in, kv_in, q_in, lm_in, lm_in],
        out_specs=[kv_in, kv_in],
        out_shape=[jax.ShapeDtypeStruct((b * h, n_pad, d), q.dtype)
                   for _ in range(2)],
        scratch_shapes=[pltpu.VMEM((blk, d), jnp.float32),
                        pltpu.VMEM((blk, d), jnp.float32)],
        compiler_params=_v5_params(),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * n_pad * n_pad * d,
            bytes_accessed=5 * b * h * n_pad * d * q.dtype.itemsize,
            transcendentals=b * h * n_pad * n_pad,
        ),
    )(qf, kf, vf, gf, lse, delta)

    def unpad(x):
        return x.reshape(b, h, n_pad, d)[:, :, :n, :]

    return unpad(dq), unpad(dk), unpad(dv)


flash_attention_large.defvjp(_fa5_fwd, _fa5_bwd)


def _v3_fits(n: int, d: int, itemsize: int) -> bool:
    """True if the exact (full-[N,N]-scores) backward fits scoped VMEM at
    one head per program — past this, only the blockwise v5 path works."""
    return 2 * 7 * n * d * itemsize + 5 * n * n * 4 <= _VMEM_BUDGET


# ---------------------------------------------------------------------------
# dispatcher
# ---------------------------------------------------------------------------


def attention_xla(q, k, v, scale):
    """XLA's built-in fused attention (jax.nn.dot_product_attention).

    The comparison/fallback implementation — and the GSPMD-visible path
    tensor-parallel runs use; expects [B, H, N, d] like the other paths
    (jax.nn uses [B, N, H, d] internally). jax.nn exposes no precision knob,
    and TPU fp32 matmuls default to bf16 passes — measured 1.9e-3 logit
    error at full ViT-B depth, OVER the 1e-3 parity bar — so fp32 inputs run
    under a float32 default-matmul-precision scope (the pallas/reference
    paths do the same per-dot via ``_prec``).
    """
    ctx = (
        jax.default_matmul_precision("float32")
        if q.dtype == jnp.float32 else contextlib.nullcontext()
    )
    with ctx:
        out = jax.nn.dot_product_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            scale=scale,
        )
    return out.transpose(0, 2, 1, 3)


def multi_head_attention(
    q,
    k,
    v,
    scale: float | None = None,
    *,
    impl: str = "auto",
    dropout_rate: float = 0.0,
    dropout_rng=None,
):
    """Dispatching MHSA over [B, H, N, d] tensors.

    ``impl='auto'`` uses the fused Pallas kernel on TPU (and interpret mode on
    CPU tests) unless attention dropout is active, which only the reference
    path supports (the reference model defaults attn_drop=0, see
    ``/root/reference/src/models/vit.py:127``). ``impl='xla'`` uses
    jax.nn.dot_product_attention.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    use_dropout = dropout_rate > 0.0 and dropout_rng is not None
    if impl == "reference" or (impl == "auto" and use_dropout):
        return attention_reference(q, k, v, scale, dropout_rate, dropout_rng)
    if use_dropout:
        raise ValueError(
            f"attention impl {impl!r} does not support attention dropout"
        )
    if impl == "xla":
        return attention_xla(q, k, v, scale)
    return attention_pallas(q, k, v, scale)
