"""Graph branch ops: patch-token adjacency construction + message passing.

The reference repo is named "Graph-Augmented-Vision-Transformers" but contains
no graph code (verified: no adjacency/kNN/message-passing anywhere under
``/root/reference/src``). This module implements the capability the driver's
north star specifies: pairwise-similarity / kNN adjacency over patch tokens
and adjacency-weighted message-passing aggregation, as

* an XLA einsum path (``build_adjacency`` + ``graph_aggregate``) — the ground
  truth, also used for the custom-VJP backward, and
* a fused Pallas TPU kernel (``fused_graph_aggregate``) that does
  similarity → sparsify → row-softmax → aggregate in a single VMEM pass per
  batch element, so the [N, N] adjacency never round-trips to HBM. The token
  buffer handed to this kernel is the same HBM array the attention kernel
  reads — adjacency build, graph aggregation and MHSA share one HBM-resident
  token buffer as the north star requires.

Adjacency modes:
  * ``dense``      — all-pairs softmax of cosine similarity (no self loops).
  * ``knn``        — top-k neighbours per row by cosine similarity.
  * ``threshold``  — edges where cosine similarity > threshold; empty rows
                     fall back to a pure self-edge.
  * ``learned_static`` — a learnable [N, N] logits table (built in the model
                     layer, not here) — row-softmaxed, shared across batch.

Sparsification masks are boolean (selection is non-differentiable, as in
standard kNN-graph practice), so gradients flow through similarities only via
the softmax weights of the selected edges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gavit_tpu.parallel.op_sharding import batch_partitioned_cached

_NEG_INF = -1e30
_EPS = 1e-6


def _prec(dtype):
    """HIGHEST for fp32 inputs (parity bar), fast default for bf16."""
    if dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


# ---------------------------------------------------------------------------
# XLA reference path
# ---------------------------------------------------------------------------


def cosine_similarity(tokens):
    """Pairwise cosine similarity: [B, N, D] → [B, N, N] (fp32 accumulate)."""
    t32 = tokens.astype(jnp.float32)
    t32 = t32 * jax.lax.rsqrt(jnp.sum(t32 * t32, axis=-1, keepdims=True) + _EPS)
    t = t32.astype(tokens.dtype)
    return jnp.einsum(
        "bid,bjd->bij", t, t, preferred_element_type=jnp.float32,
        precision=_prec(tokens.dtype),
    )


def build_adjacency(
    tokens,
    *,
    mode: str = "knn",
    k: int = 8,
    threshold: float = 0.0,
    temperature: float = 1.0,
):
    """Row-stochastic adjacency [B, N, N] from patch tokens [B, N, D]."""
    n = tokens.shape[-2]
    sim = cosine_similarity(tokens)
    eye = jnp.eye(n, dtype=bool)
    no_self = ~eye

    if mode == "dense":
        mask = jnp.broadcast_to(no_self, sim.shape)
    elif mode == "knn":
        kk = min(k, n - 1)
        masked_sim = jnp.where(no_self, sim, _NEG_INF)
        # select by top_k INDICES, not a >=kth threshold: duplicate
        # similarities (e.g. identical black-border patches) would otherwise
        # over-select. XLA TopK is stable — ties resolve to lower indices —
        # which the fused kernel's extraction loop reproduces exactly.
        idx = jax.lax.top_k(masked_sim, kk)[1]
        mask = jnp.any(
            idx[..., None] == jnp.arange(n, dtype=idx.dtype), axis=-2
        )
    elif mode == "threshold":
        mask = (sim > threshold) & no_self
        # rows with no edge above threshold fall back to a self-edge
        row_any = jnp.any(mask, axis=-1, keepdims=True)
        mask = jnp.where(row_any, mask, eye)
    else:
        raise ValueError(f"unknown adjacency mode: {mode!r}")

    logits = jnp.where(mask, sim / temperature, _NEG_INF)
    return jax.nn.softmax(logits, axis=-1)


def graph_aggregate(adj, values):
    """Adjacency-weighted aggregation: [B,N,N] @ [B,N,D] → [B,N,D]."""
    out = jnp.einsum(
        "bij,bjd->bid", adj.astype(values.dtype), values,
        preferred_element_type=jnp.float32, precision=_prec(values.dtype),
    )
    return out.astype(values.dtype)


def _reference_fused(tokens, values, mode, k, threshold, temperature):
    adj = build_adjacency(
        tokens, mode=mode, k=k, threshold=threshold, temperature=temperature
    )
    return graph_aggregate(adj, values)


# ---------------------------------------------------------------------------
# fused pallas kernel
# ---------------------------------------------------------------------------


def _graph_kernel(
    t_ref,
    v_ref,
    o_ref,
    adj_ref,
    *,
    mode: str,
    k: int,
    threshold: float,
    temperature: float,
    n_valid: int,
):
    t_in = t_ref[0]
    v = v_ref[0]
    prec = _prec(t_in.dtype)
    n_pad = t_in.shape[0]

    # cosine similarity in VMEM: normalise in fp32, dot in native dtype
    t32 = t_in.astype(jnp.float32)
    t32 = t32 * jax.lax.rsqrt(jnp.sum(t32 * t32, axis=-1, keepdims=True) + _EPS)
    t = t32.astype(t_in.dtype)
    sim = jax.lax.dot_general(
        t, t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )

    row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    valid = col < n_valid
    eye = row == col
    no_self = jnp.logical_not(eye) & valid

    if mode == "dense":
        mask = no_self
    elif mode == "knn":
        kk = min(k, n_valid - 1)
        work = jnp.where(no_self, sim, _NEG_INF)
        # iterative max-extraction, ONE element per pass (leftmost of the
        # row maxima), matching jax.lax.top_k's stable lower-index-first tie
        # rule so duplicate similarities select exactly k edges and the
        # XLA-recompute backward sees the same adjacency. Float masks —
        # Mosaic cannot lower bool reductions/selects.
        col_f = col.astype(jnp.float32)
        big = jnp.float32(n_pad)
        sel = jnp.zeros((n_pad, n_pad), jnp.float32)
        for _ in range(kk):
            m = jnp.max(work, axis=-1, keepdims=True)
            is_max = jnp.where(work >= m, 1.0, 0.0)
            first = jnp.min(
                jnp.where(is_max > 0.5, col_f, big), axis=-1, keepdims=True
            )
            hit = jnp.where(col_f == first, 1.0, 0.0)
            sel = sel + hit
            work = jnp.where(hit > 0.5, _NEG_INF, work)
        mask = no_self & (sel > 0.5)
    elif mode == "threshold":
        # float masks: Mosaic cannot lower bool reductions / bool selects
        # ("unsupported target bitwidth for truncation")
        edge = jnp.where((sim > threshold) & no_self, 1.0, 0.0)
        row_any = jnp.sum(edge, axis=-1, keepdims=True) > 0.5
        self_edge = jnp.where(eye & valid, 1.0, 0.0)
        mask = jnp.where(row_any, edge, self_edge) > 0.5
    else:
        raise ValueError(f"unknown adjacency mode: {mode!r}")

    logits = jnp.where(mask, sim / temperature, _NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    adj = p * pl.reciprocal(denom, approx=False)
    # the adjacency is a second output so the custom-VJP backward reuses it
    # instead of recomputing sim → top_k → softmax through XLA (profiled
    # ≈2 ms/step of top_k alone at ViT-B b128 with 2 graph blocks)
    adj_ref[0] = adj
    o_ref[0] = jnp.dot(
        adj.astype(v.dtype), v, preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(o_ref.dtype)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _run_fused(tokens, values, mode, k, threshold, temperature):
    # batch-local under a data-sharded mesh (see parallel/op_sharding.py)
    return batch_partitioned_cached(
        _run_fused_impl, 2, 2, mode, k, threshold, temperature
    )(tokens, values)


def _run_fused_impl(tokens, values, mode, k, threshold, temperature):
    b, n, d = tokens.shape
    # no host-side padding: Mosaic tiles ragged N internally, and the
    # pad/slice HBM traffic costs more than the masked tile edges
    n_pad = n
    tp, vp = tokens, values
    kern = functools.partial(
        _graph_kernel,
        mode=mode,
        k=k,
        threshold=threshold,
        temperature=temperature,
        n_valid=n,
    )
    out, adj = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, n_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, n_pad, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, d), values.dtype),
            jax.ShapeDtypeStruct((b, n_pad, n_pad), jnp.float32),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * n_pad * n_pad * d,
            bytes_accessed=3 * b * n_pad * d * 4,
            transcendentals=b * n_pad * n_pad,
        ),
    )(tp, vp)
    return out[:, :n, :], adj[:, :n, :n]


# ---------------------------------------------------------------------------
# large-N path: row-chunked XLA aggregation (the graph branch's scaling
# story past the single-pass kernel's VMEM cliff — r5, VERDICT r4 #3/#5)
# ---------------------------------------------------------------------------

# The single-pass kernel holds ~5 [N, N] fp32 working buffers (sim, the
# top-k extraction workspace + selection, logits/probs, the adjacency
# output block); past the scoped-VMEM budget Mosaic refuses or thrashes.
# 12 MB / (5 · 4 B) → N ≈ 790, consistent with attention's measured v5
# cliff at N≈800.
_KERNEL_VMEM_BUDGET = 12 * 1024 * 1024


def _kernel_vmem_need(n: int, d: int, itemsize: int) -> int:
    return 5 * n * n * 4 + 3 * n * d * itemsize


def needs_chunked(n: int, d: int, itemsize: int) -> bool:
    return _kernel_vmem_need(n, d, itemsize) > _KERNEL_VMEM_BUDGET


def _chunk_topk_impl() -> str:
    """kNN selection inside the chunked path: 'iter' (k leftmost-max
    extraction passes — VPU reductions) or 'topk' (lax.top_k's sort-based
    lowering). Default 'iter' on TPU from the r5 interleaved recheck
    (`logs/r5_graph_recheck.log`): 3.3 vs 7.2 ms/call at N=1025 b8, 6.8 vs
    25.3 at N=4097 b2 — the sort dominates the chunked path's cost. CPU
    keeps lax.top_k (the extraction loop is slower off-TPU).
    GAVIT_GRAPH_TOPK overrides."""
    import os

    default = "iter" if jax.default_backend() == "tpu" else "topk"
    return os.environ.get("GAVIT_GRAPH_TOPK", default)


# [chunk, N] slice-element cap: the checkpointed chunk body's BACKWARD
# fusion holds several such fp32 buffers in scoped VMEM at once — at
# chunk=384, N=4097 (1.62M elements) XLA overflowed the 16 MB scoped
# limit by 156 KB inside the recompute (r5, logs/r5_1024_train.log);
# 384·1152 = 442k (N=1025) trains fine. 600k keeps ~1.4× headroom over
# the known-good point while still allowing chunk=128 at N=4097.
_CHUNK_ELEMS = 600_000


def _pick_chunk(n: int) -> int:
    """Query-row chunk: smallest padded total, largest chunk on ties —
    keeps the [chunk, N] similarity slice MXU-shaped while wasting the
    fewest pad rows — bounded by the scoped-VMEM element cap above
    (N=1025 → 384; N=4097 → 128; override: GAVIT_GRAPH_CHUNK)."""
    import os

    env = os.environ.get("GAVIT_GRAPH_CHUNK")
    if env:
        return int(env)
    if n <= 64:
        return n
    cands = [c for c in (512, 384, 256, 128) if c < n and c * n <= _CHUNK_ELEMS]
    if not cands:
        # 2048px-class N: even 128 exceeds the cap — shrink until the
        # slice fits (8-row granularity; r5 review finding #5)
        return max(8, _CHUNK_ELEMS // n // 8 * 8)
    return min(cands, key=lambda c: (-(-n // c) * c, -c))


def graph_aggregate_chunked(tokens, values, mode: str = "knn", k: int = 8,
                            threshold: float = 0.0, temperature: float = 1.0,
                            chunk: int = 0):
    """Exact ``build_adjacency`` + ``graph_aggregate`` without ever
    materialising [B, N, N]: a sequential ``lax.map`` over query-row chunks
    computes each [B, chunk, N] similarity slice, sparsifies it with the
    SAME stable ``jax.lax.top_k`` (identical tie semantics — no semantic
    fork at large N), row-softmaxes and aggregates. ``jax.checkpoint`` on
    the chunk body keeps autodiff memory at O(N·chunk) — the backward
    recomputes each slice (the flash-attention trade). Gradients flow
    through the softmax weights only (selection masks are comparisons),
    matching the small-N paths.
    """
    b, n, d = tokens.shape
    cn = min(chunk or _pick_chunk(n), n)
    n_pad = -(-n // cn) * cn
    prec = _prec(tokens.dtype)

    t32 = tokens.astype(jnp.float32)
    t32 = t32 * jax.lax.rsqrt(jnp.sum(t32 * t32, axis=-1, keepdims=True)
                              + _EPS)
    tnorm = t32.astype(tokens.dtype)                       # [B, N, D]
    tq = jnp.pad(tnorm, ((0, 0), (0, n_pad - n), (0, 0)))
    tq = tq.reshape(b, n_pad // cn, cn, d).swapaxes(0, 1)  # [C, B, cn, D]
    row_ids = jnp.arange(n_pad, dtype=jnp.int32).reshape(n_pad // cn, cn)
    cols = jnp.arange(n, dtype=jnp.int32)
    kk = min(k, n - 1)

    @jax.checkpoint
    def body(tq_c, rows_c):
        sim = jnp.einsum("bcd,bnd->bcn", tq_c, tnorm,
                         preferred_element_type=jnp.float32, precision=prec)
        eye = rows_c[:, None] == cols[None, :]              # [cn, N]
        no_self = ~eye
        if mode == "dense":
            mask = jnp.broadcast_to(no_self, sim.shape)
        elif mode == "knn":
            masked = jnp.where(no_self, sim, _NEG_INF)
            if _chunk_topk_impl() == "iter":
                # k leftmost-max extraction passes (the fused kernel's
                # loop): O(k·N) VPU reductions instead of lax.top_k's
                # sort-based lowering — same stable lower-index-first tie
                # rule, pinned by the duplicate-token test
                col_f = cols.astype(jnp.float32)
                big = jnp.float32(sim.shape[-1])
                work = masked
                mask = jnp.zeros(sim.shape, bool)
                for _ in range(kk):
                    m = jnp.max(work, axis=-1, keepdims=True)
                    is_max = work >= m
                    first = jnp.min(
                        jnp.where(is_max, col_f, big), axis=-1,
                        keepdims=True)
                    hit = col_f == first
                    mask = mask | hit
                    work = jnp.where(hit, _NEG_INF, work)
                mask = mask & no_self
            else:
                idx = jax.lax.top_k(masked, kk)[1]
                mask = jnp.any(idx[..., None] == cols, axis=-2)
        elif mode == "threshold":
            mask = (sim > threshold) & no_self
            row_any = jnp.any(mask, axis=-1, keepdims=True)
            mask = jnp.where(row_any, mask, eye)
        else:
            raise ValueError(f"unknown adjacency mode: {mode!r}")
        logits = jnp.where(mask, sim / temperature, _NEG_INF)
        adj = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bcn,bnd->bcd", adj.astype(values.dtype), values,
                         preferred_element_type=jnp.float32, precision=prec)
        return out.astype(values.dtype)

    outs = jax.lax.map(lambda args: body(*args), (tq, row_ids))
    out = outs.swapaxes(0, 1).reshape(b, n_pad, d)
    return out[:, :n]


def fused_graph_aggregate(
    tokens, values, mode: str = "knn", k: int = 8, threshold: float = 0.0,
    temperature: float = 1.0,
):
    """Fused similarity → sparsify → softmax → aggregate, size-dispatched
    (the attention-style chain, VERDICT r4 #5):

    * N within the VMEM budget → the single-pass Pallas kernel (adjacency
      never leaves VMEM; closed-form VJP over the kernel's saved adjacency).
    * N past the cliff (≈790 at fp32) → :func:`graph_aggregate_chunked` —
      row-chunked XLA with rematerialised slices, exact same semantics.
    """
    n, d = tokens.shape[-2], tokens.shape[-1]
    if needs_chunked(n, d, tokens.dtype.itemsize):
        return graph_aggregate_chunked(tokens, values, mode, k, threshold,
                                       temperature)
    return _fused_small(tokens, values, mode, k, threshold, temperature)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused_small(
    tokens, values, mode: str = "knn", k: int = 8, threshold: float = 0.0,
    temperature: float = 1.0,
):
    """Single-pass kernel path (N within VMEM).

    Forward runs the Pallas kernel, which also emits the
    row-stochastic adjacency; backward is a closed-form VJP over that saved
    adjacency (softmax + cosine-similarity chain rules) — no sparsification
    recompute, so no top_k in the backward (≈2 ms/step saved at ViT-B b128)
    and the gradient is guaranteed to use EXACTLY the forward's adjacency.
    """
    out, _ = _run_fused(tokens, values, mode, k, threshold, temperature)
    return out


def _fga_fwd(tokens, values, mode, k, threshold, temperature):
    out, adj = _run_fused(tokens, values, mode, k, threshold, temperature)
    return out, (tokens, values, adj)


def _fga_bwd(mode, k, threshold, temperature, res, g):
    tokens, values, adj = res
    g32 = g.astype(jnp.float32)
    prec = _prec(tokens.dtype)

    # out = A @ v:  dv = Aᵀ g,  dA = g vᵀ
    dv = jnp.einsum(
        "bij,bid->bjd", adj, g32, preferred_element_type=jnp.float32,
        precision=prec,
    )
    dA = jnp.einsum(
        "bid,bjd->bij", g32, values.astype(jnp.float32),
        preferred_element_type=jnp.float32, precision=prec,
    )
    # row-softmax bwd — masked entries have A == 0, so dlogits == 0 there
    # (selection is non-differentiable by design, matching build_adjacency)
    dlogits = adj * (dA - jnp.sum(dA * adj, axis=-1, keepdims=True))
    dsim = dlogits / temperature

    # cosine-sim bwd: sim = n nᵀ with n = t · rsqrt(Σt² + eps)
    t32 = tokens.astype(jnp.float32)
    r = jax.lax.rsqrt(jnp.sum(t32 * t32, axis=-1, keepdims=True) + _EPS)
    nvec = t32 * r
    dn = jnp.einsum(
        "bij,bjd->bid", dsim, nvec, preferred_element_type=jnp.float32,
        precision=prec,
    ) + jnp.einsum(
        "bji,bjd->bid", dsim, nvec, preferred_element_type=jnp.float32,
        precision=prec,
    )
    dt = r * dn - t32 * (r ** 3) * jnp.sum(dn * t32, axis=-1, keepdims=True)
    return dt.astype(tokens.dtype), dv.astype(values.dtype)


_fused_small.defvjp(_fga_fwd, _fga_bwd)
