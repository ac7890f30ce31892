"""Ring attention: context parallelism for the attention op itself.

The reference is single-device (``/root/reference/scripts/train.py:133``)
and its attention materialises the full [B, H, N, N] score matrix
(``/root/reference/src/models/vit.py:59-66``), so sequence length is capped
by one device's memory. The existing scaling paths cover the reference's
model family: dp/fsdp shard the batch, tp shards heads, sp (Megatron-SP)
shards the *elementwise* segments between attention/MLP — but attention
itself still sees the full token axis on every chip. This module closes
that last axis: the sequence is sharded over a mesh axis, each chip holds
one Q/K/V block, and K/V blocks rotate around the ring with
``lax.ppermute`` while an online-softmax accumulator (running max ``m``,
normaliser ``l``, unnormalised output ``o``) folds in one block per step —
the flash-attention recurrence distributed over ICI. Per-chip memory is
O(N·N/S²) for scores and O(N/S·d) for activations; compute and
communication overlap step-to-step (each tick's GEMMs hide the next
block's ppermute).

ViT relevance: attention is bidirectional (no causal/segment masking
needed), and token counts grow quadratically with image size — 224px→197,
384px→577, 1024px→4097, at which point single-chip attention (even the v5
blockwise kernel) stops scaling. Ring attention makes token count a mesh
config: N splits over ``ctx`` chips exactly.

Autodiff: the forward is a ``lax.scan`` over ring steps; JAX differentiates
through scan + ppermute, yielding the reverse ring (gradients ride the same
links backwards) — no hand-written backward schedule, same design as the
GPipe trunk (``parallel/pp.py``).

Exactness: online softmax is algebraically exact (not an approximation);
``tests/test_ring_attention.py`` pins outputs AND input gradients against
``ops.attention.attention_reference`` on the 8-device CPU mesh, including a
ctx×head-TP composition and ragged head counts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def _prec(dtype):
    # fp32 dots must force HIGHEST: TPU fp32 matmuls default to bf16 passes
    # (same rule as ops/attention.py::_prec; duplicated here because this
    # module is imported from the package __init__ before ops is loadable)
    if dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def make_ctx_mesh(ctx: int, data: int = 1, devices=None) -> Mesh:
    """A ('data', 'ctx') mesh: batch replicas × sequence shards."""
    devices = devices if devices is not None else jax.devices()
    if ctx * data > len(devices):
        raise ValueError(
            f"ctx={ctx} × data={data} needs {ctx * data} devices, "
            f"have {len(devices)}"
        )
    arr = np.asarray(devices[: ctx * data]).reshape(data, ctx)
    return Mesh(arr, ("data", "ctx"))


def ring_attention_local(q, k, v, scale: float, axis_name: str,
                         n_valid: int | None = None):
    """One chip's ring-attention step loop — call INSIDE ``shard_map``.

    Args:
      q, k, v: [B, H, n_local, d] — this chip's sequence shard.
      scale: score scale (1/sqrt(d)).
      axis_name: the mesh axis the sequence is sharded over.
      n_valid: global count of REAL tokens when the sequence was padded to
        a multiple of the axis size (``parallel/cp.py``); keys at global
        index ≥ n_valid are masked out of the softmax. Key ownership is
        derived from the ring step (block t came from chip (i−t) mod S),
        so no mask rides the ppermute. None → no masking.
    Returns:
      [B, H, n_local, d] — this chip's rows of softmax(QKᵀ·scale)V over the
      FULL sequence, exactly (online-softmax accumulation in fp32).
    """
    S = lax.axis_size(axis_name)
    prec = _prec(q.dtype)
    b, h, n, d = q.shape
    qf = q
    # finite lower bound (not -inf): a fully-masked block would otherwise
    # produce (-inf) − (-inf) = nan in the rescale
    m0 = jnp.full((b, h, n, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((b, h, n, 1), jnp.float32)
    o0 = jnp.zeros((b, h, n, d), jnp.float32)
    ring = [(i, (i + 1) % S) for i in range(S)]
    idx = lax.axis_index(axis_name)

    def step(carry, t):
        kb, vb, m, l, o = carry
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, kb,
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale
        if n_valid is not None:
            owner = (idx - t) % S
            key_ok = owner * n + jnp.arange(n) < n_valid
            s = jnp.where(key_ok[None, None, None, :], s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        o = o * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(vb.dtype), vb,
            preferred_element_type=jnp.float32, precision=prec,
        )
        kb = lax.ppermute(kb, axis_name, ring)
        vb = lax.ppermute(vb, axis_name, ring)
        return (kb, vb, m_new, l, o), None

    (_, _, _, l, o), _ = lax.scan(
        step, (k, v, m0, l0, o0), jnp.arange(S), length=S)
    # pad-query rows (global index ≥ n_valid) have l == 0 — keep them
    # finite; their outputs are discarded by the caller
    return (o / jnp.maximum(l, 1e-30)).astype(q.dtype)


@functools.partial(jax.jit, static_argnums=(4, 5))
def _ring_sharded(q, k, v, scale, mesh, axis):
    spec = P(None, None, axis, None)
    return jax.shard_map(
        functools.partial(ring_attention_local, scale=scale, axis_name=axis),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)


def ring_attention(q, k, v, scale: float, mesh: Mesh, axis: str = "ctx"):
    """softmax(QKᵀ·scale)V with the sequence sharded over ``mesh[axis]``.

    Takes GLOBAL [B, H, N, d] arrays (N divisible by the axis size), shards
    the token dim, and runs the ring. Differentiable; exact vs
    ``attention_reference`` up to fp reassociation.
    """
    S = mesh.shape[axis]
    n = q.shape[2]
    if n % S:
        raise ValueError(f"sequence {n} not divisible by {axis}={S}")
    return _ring_sharded(q, k, v, scale, mesh, axis)
