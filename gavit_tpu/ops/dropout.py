"""Memory-free fused dropout (Pallas, hardware PRNG).

XLA dropout materialises a uniform fp32 tensor, compares, and selects —
three full passes over HBM per site (profiled ≈16 ms/step at ViT-B b128
across the model's ~36 dropout sites, even with the rbg PRNG). This kernel
does one read + one write: random bits come from the TPU's per-core PRNG
(``pltpu.prng_random_bits``) seeded deterministically per (site, step,
program), the keep-mask is a uint32 threshold compare in registers, and —
flash-style — the backward pass regenerates the identical mask from the same
seed instead of storing it, so the mask never exists in HBM at all.

Determinism: seed = fold(base_seed, program_id); the same (rng, shape, rate)
always produces the same mask, and fwd/bwd agree exactly (tested).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gavit_tpu.parallel.op_sharding import elementwise_partitioned


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _dropout_kernel(seed_ref, x_ref, o_ref, *, rate: float):
    # distinct stream per grid program, deterministic in the seed
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[0]
    bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
    threshold = jnp.uint32(int(rate * 0xFFFFFFFF))
    keep = bits >= threshold
    scale = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    o_ref[0] = jnp.where(keep, x * scale, 0).astype(o_ref.dtype)


def _run(x, seed, rate):
    if not _on_tpu():
        # distribution-equivalent XLA fallback (the pallas interpreter's
        # PRNG is a zero stub on CPU); same seed → same mask, fwd == bwd
        keep = jax.random.bernoulli(
            jax.random.PRNGKey(seed[0].astype(jnp.uint32)), 1.0 - rate,
            x.shape,
        )
        return jnp.where(keep, x / jnp.asarray(1.0 - rate, x.dtype), 0)
    # batch-local under a data-sharded mesh; the per-shard seed offset
    # (axis_index × local image count) keeps every (chip, program) PRNG
    # stream distinct, identically in forward and backward
    return _dropout_cp(rate)(x, seed)


@functools.lru_cache(maxsize=None)
def _dropout_cp(rate):
    # elementwise: batch/token/feature shards all run kernel-locally (TP's
    # feature-sharded hidden and SP's token-sharded residual stream included)
    return elementwise_partitioned(
        lambda x, seed: _run_kernel(x, seed, rate),
        seed_arg=1, seed_stride=lambda args: args[0].shape[0],
    )


def _run_kernel(x, seed, rate):
    b = x.shape[0]
    block = (1,) + x.shape[1:]
    idx = lambda i: (i,) + (0,) * (x.ndim - 1)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_dropout_kernel, rate=rate),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(seed, x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_dropout(x, seed, rate: float):
    """Dropout with in-kernel PRNG: x [B, ...], seed int32 [1], static rate."""
    return _run(x, seed, rate)


def _fd_fwd(x, seed, rate):
    return _run(x, seed, rate), seed


def _fd_bwd(rate, seed, g):
    # regenerate the identical mask: dropout is linear in x, so
    # dx = dropout(g) with the same seed
    return _run(g, seed, rate), None


fused_dropout.defvjp(_fd_fwd, _fd_bwd)


def dropout_seed(rng) -> jax.Array:
    """Derive an int32 kernel seed from a JAX PRNG key (cheap scalar)."""
    return jax.random.randint(rng, (1,), minval=0, maxval=2**31 - 1,
                              dtype=jnp.int32)


# ---------------------------------------------------------------------------
# fused dropout + residual add
# ---------------------------------------------------------------------------


def _dropout_add_kernel(seed_ref, y_ref, r_ref, o_ref, *, rate: float):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    y = y_ref[0]
    r = r_ref[0]
    bits = pltpu.bitcast(pltpu.prng_random_bits(y.shape), jnp.uint32)
    threshold = jnp.uint32(int(rate * 0xFFFFFFFF))
    keep = bits >= threshold
    scale = jnp.asarray(1.0 / (1.0 - rate), y.dtype)
    o_ref[0] = (r + jnp.where(keep, y * scale, 0)).astype(o_ref.dtype)


def _run_add(y, residual, seed, rate):
    if not _on_tpu():
        keep = jax.random.bernoulli(
            jax.random.PRNGKey(seed[0].astype(jnp.uint32)), 1.0 - rate,
            y.shape,
        )
        return residual + jnp.where(
            keep, y / jnp.asarray(1.0 - rate, y.dtype), 0
        )
    return _dropout_add_cp(rate)(y, residual, seed)


@functools.lru_cache(maxsize=None)
def _dropout_add_cp(rate):
    return elementwise_partitioned(
        lambda y, r, seed: _run_add_kernel(y, r, seed, rate),
        seed_arg=2, seed_stride=lambda args: args[0].shape[0],
    )


def _run_add_kernel(y, residual, seed, rate):
    b = y.shape[0]
    block = (1,) + y.shape[1:]
    idx = lambda i: (i,) + (0,) * (y.ndim - 1)  # noqa: E731
    return pl.pallas_call(
        functools.partial(_dropout_add_kernel, rate=rate),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
    )(seed, y, residual)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_dropout_add(y, residual, seed, rate: float):
    """residual + dropout(y) in ONE kernel pass.

    NOTE: measured SLOWER than separate fused_dropout + XLA add inside the
    ViT block (+4.4 ms/step at ViT-B b128, BASELINE.md round-2 table) — the
    extra kernel boundary beats the saved round-trip there, so ``Block`` does
    not use it; kept as a standalone op for shapes where it wins.

    Saves the intermediate dropout output's full HBM round-trip per residual
    site (24 sites/step at ViT-B): the branch tensor is read once, the mask
    comes from the in-kernel PRNG, and the sum is written directly. Backward:
    d_residual = g (no kernel — pure aliasing), d_y = dropout(g) with the
    same seed (mask regenerated, flash-style, never stored).
    """
    return _run_add(y, residual, seed, rate)


def _fda_fwd(y, residual, seed, rate):
    return _run_add(y, residual, seed, rate), seed


def _fda_bwd(rate, seed, g):
    return _run(g, seed, rate), g, None


fused_dropout_add.defvjp(_fda_fwd, _fda_bwd)


# ---------------------------------------------------------------------------
# fused exact-GELU + dropout (the MLP mid-activation site)
# ---------------------------------------------------------------------------

_INV_SQRT2 = 0.7071067811865476
_INV_SQRT2PI = 0.3989422804014327


def _erf_f32(x):
    """erf from exp/mul/add only (Mosaic lowers no `erf` primitive):
    Abramowitz–Stegun 7.1.26 rational approximation, max abs error 1.5e-7
    exact / 2.8e-6 measured in fp32 arithmetic — far below bf16 resolution
    and >2 orders under the 1e-3 parity bar."""
    s = jnp.where(x < 0.0, -1.0, 1.0)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_f32(x):
    return x * 0.5 * (1.0 + _erf_f32(x * _INV_SQRT2))


def _gelu_grad_f32(x):
    # d/dx [x·Φ(x)] = Φ(x) + x·φ(x)
    phi = jnp.exp(x * x * -0.5) * _INV_SQRT2PI
    cdf = 0.5 * (1.0 + _erf_f32(x * _INV_SQRT2))
    return cdf + x * phi


def _gelu_and_grad_f32(x):
    """(GELU(x), GELU'(x)) from ONE exp evaluation.

    The A&S erf polynomial evaluates ``exp(-z²)`` at z = x/√2 — which IS
    the Gaussian pdf term ``exp(-x²/2)`` the derivative needs — so the
    backward kernels compute both g and g' for one exp + one polynomial
    instead of three exps + two polynomials (the VPU recompute was ~40% of
    the MLP backward kernel's time; BASELINE.md r3).
    """
    z = x * _INV_SQRT2
    s = jnp.where(z < 0.0, -1.0, 1.0)
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    e = jnp.exp(-az * az)  # = exp(-x²/2)
    erf = s * (1.0 - poly * e)
    cdf = 0.5 * (1.0 + erf)
    phi = e * _INV_SQRT2PI
    return x * cdf, cdf + x * phi


def _gd_seed(seed_ref):
    # unique stream per (image, token-block); fwd and bwd run the SAME grid
    # so the regenerated backward mask matches the forward's exactly
    return seed_ref[0] + pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)


def _gelu_dropout_kernel(seed_ref, x_ref, o_ref, *, rate: float):
    pltpu.prng_seed(_gd_seed(seed_ref))
    x = x_ref[0].astype(jnp.float32)
    bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
    keep = bits >= jnp.uint32(int(rate * 0xFFFFFFFF))
    y = _gelu_f32(x) * (1.0 / (1.0 - rate))
    o_ref[0] = jnp.where(keep, y, 0.0).astype(o_ref.dtype)


def _gelu_dropout_bwd_kernel(seed_ref, x_ref, g_ref, o_ref, *, rate: float):
    # regenerate the identical mask; dx = mask/keep · gelu'(x) · g
    pltpu.prng_seed(_gd_seed(seed_ref))
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    bits = pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
    keep = bits >= jnp.uint32(int(rate * 0xFFFFFFFF))
    dx = _gelu_grad_f32(x) * g * (1.0 / (1.0 - rate))
    o_ref[0] = jnp.where(keep, dx, 0.0).astype(o_ref.dtype)


def _gd_token_block(n: int, f: int) -> int:
    """Token-dim block bound: the full [N, F] row per program walks off the
    16 MB scoped-VMEM cliff at 384px (measured: [577, 3072] bf16 wants
    20.5 MB scoped; [197, 3072] fits). Scoped usage scales ≈linearly at
    ~35.6 KB per row at F=3072, so cap rows at 256·(3072/F) — one block
    (unchanged behavior) at 224px, three blocks at 384px."""
    return min(n, max(8, 256 * 3072 // max(f, 1)))


def _gd_mask(x, seed, rate):
    keep = jax.random.bernoulli(
        jax.random.PRNGKey(seed[0].astype(jnp.uint32)), 1.0 - rate, x.shape
    )
    return keep


def _gd_grid(x):
    """(grid, block, index_map) blocking dim 0 per image and — for rank-3
    inputs — dim 1 in token chunks (same grid fwd and bwd: the mask stream
    is a function of the grid position)."""
    b = x.shape[0]
    if x.ndim >= 3:
        bn = _gd_token_block(x.shape[1], int(np.prod(x.shape[2:])))
        grid = (b, -(-x.shape[1] // bn))
        block = (1, bn) + x.shape[2:]
    else:
        grid = (b, 1)
        block = (1,) + x.shape[1:]
    idx = lambda i, j: (i, j) + (0,) * (x.ndim - 2)  # noqa: E731
    return grid, block, idx


def _gd_stride(args):
    """Per-shard PRNG-stream count: the full local grid (images × token
    blocks) — identical in forward and backward, which run the same grid."""
    return int(np.prod(_gd_grid(args[0])[0]))


def _run_gelu_dropout(x, seed, rate):
    if not _on_tpu():
        y = _gelu_f32(x.astype(jnp.float32)) / (1.0 - rate)
        return jnp.where(_gd_mask(x, seed, rate), y, 0.0).astype(x.dtype)
    return _gd_cp(rate)(x, seed)


@functools.lru_cache(maxsize=None)
def _gd_cp(rate):
    # elementwise rule: under Megatron TP the fc1 hidden arrives feature-
    # sharded — the old batch-only declaration all-gathered [B, N, F] here
    # every block (fwd AND bwd)
    return elementwise_partitioned(
        lambda x, seed: _run_gelu_dropout_kernel(x, seed, rate),
        seed_arg=1, seed_stride=_gd_stride,
    )


def _run_gelu_dropout_kernel(x, seed, rate):
    grid, block, idx = _gd_grid(x)
    return pl.pallas_call(
        functools.partial(_gelu_dropout_kernel, rate=rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(seed, x)


def _run_gelu_dropout_bwd(x, g, seed, rate):
    if not _on_tpu():
        dx = (_gelu_grad_f32(x.astype(jnp.float32))
              * g.astype(jnp.float32) / (1.0 - rate))
        return jnp.where(_gd_mask(x, seed, rate), dx, 0.0).astype(x.dtype)
    return _gd_bwd_cp(rate)(x, g, seed)


@functools.lru_cache(maxsize=None)
def _gd_bwd_cp(rate):
    return elementwise_partitioned(
        lambda x, g, seed: _run_gelu_dropout_bwd_kernel(x, g, seed, rate),
        seed_arg=2, seed_stride=_gd_stride,
    )


def _run_gelu_dropout_bwd_kernel(x, g, seed, rate):
    grid, block, idx = _gd_grid(x)
    return pl.pallas_call(
        functools.partial(_gelu_dropout_bwd_kernel, rate=rate),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(block, idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(seed, x, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_gelu_dropout(x, seed, rate: float):
    """dropout(GELU_exact(x)) in ONE kernel pass (the MLP mid-site).

    Moves the erf off the fc1 GEMM epilogue — where its VPU cost gates the
    MXU pipeline (measured 0.68 ms/pair, BASELINE.md) — into the dropout
    kernel's HBM-bound phase, where the transcendental hides behind the
    memory traffic. Backward is one kernel too (mask regenerated from the
    seed, gelu' recomputed from the saved input): 3 tensor passes instead of
    XLA's 5 (dropout-bwd R+W, then gelu-bwd R(gm, x)+W).
    GELU is exact erf computed in fp32 in-kernel (the training-parity form;
    the tanh approximation is inference-only — see models/layers.py).
    """
    return _run_gelu_dropout(x, seed, rate)


def _fgd_fwd(x, seed, rate):
    return _run_gelu_dropout(x, seed, rate), (x, seed)


def _fgd_bwd(rate, res, g):
    x, seed = res
    return _run_gelu_dropout_bwd(x, g, seed, rate), None


fused_gelu_dropout.defvjp(_fgd_fwd, _fgd_bwd)
