"""Context-parallel ViT forward: the token axis sharded end-to-end.

`parallel/ring.py` gives the attention op a sequence-sharded form; this
module runs the WHOLE trunk that way. Everything between attentions —
LayerNorm, the MLP, residual adds — is token-elementwise, so each chip
keeps only its n/S token rows through the entire depth; attention is the
one op that mixes tokens, and it runs as the ring (K/V blocks rotating
over ICI under the online-softmax accumulator). Per-chip activation
memory and MLP/qkv/proj GEMM work both scale 1/S — the scaling path for
image sizes whose token count outgrows one chip (1024px ⇒ N=4097; the
reference materialises the full [B, H, N, N] score matrix per block,
/root/reference/src/models/vit.py:59-66, and is capped far earlier).

Design notes:
  * tokens pad to a multiple of the 'ctx' axis; padded KEYS are masked
    out of every softmax inside the ring (`n_valid`), padded query rows
    compute garbage that never mixes back into real rows and is dropped
    at the head.
  * weights stay replicated (they are small next to N·N scores); the cls
    readout is a psum-broadcast of shard 0's row 0 after the final LN.
  * the GRAPH branch runs token-sharded too (`_graph_cp`): each chip
    builds only its own rows of the adjacency — cosine similarity of the
    local rows against the all-gathered (normalised) token blocks, the
    same masked top-k / threshold / dense / learned-static selection as
    ``ops.graph_ops.build_adjacency`` over global column ids, row-softmax,
    then a [nl, N]×[N, D] aggregation against the gathered values. The
    full [N, N] adjacency never exists on any chip — exactly the regime
    cp exists for (1024px ⇒ N=4097, where N² stops fitting alongside the
    activations). CLS/pad rows bypass via masking, reproducing the
    sequential ``include_cls`` semantics bit-for-bit.
  * scope mirrors `parallel/pp.py`: deterministic blocks, XLA-einsum
    attention inside the manual region; MoE stays on dp/EP. The trunk is
    differentiable end to end (autodiff of scan+ppermute+all_gather = the
    reverse ring / reduce-scatter).

Parity is pinned by ``tests/test_context_parallel.py``: logits AND param
grads equal to ``VisionTransformer.apply`` on the same param tree,
including a ctx×data mesh, a token count that does NOT divide the axis
(pad path), and every adjacency mode of the graph branch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from gavit_tpu.config import ModelConfig
from gavit_tpu.parallel.pp import _embed, _head
from gavit_tpu.parallel.ring import ring_attention_local

# models.layers imports from this package — import lazily (same pattern as
# parallel/pp.py).


def make_cp_mesh(ctx: int, data: int = 1, devices=None) -> Mesh:
    """A ('data', 'ctx') mesh: batch replicas × token shards."""
    devices = devices if devices is not None else jax.devices()
    if ctx * data > len(devices):
        raise ValueError(
            f"ctx={ctx} × data={data} needs {ctx * data} devices, "
            f"have {len(devices)}"
        )
    arr = np.asarray(devices[: ctx * data]).reshape(data, ctx)
    return Mesh(arr, ("data", "ctx"))


def _prec(dtype):
    if dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def _ln(p, x, dtype):
    from gavit_tpu.models.layers import LN_EPS

    return nn.LayerNorm(epsilon=LN_EPS, dtype=dtype).apply({"params": p}, x)


def _block_cp(cfg: ModelConfig, dtype, p, x, n_valid: int, axis: str):
    """One pre-LN block on this chip's token rows; ring for the attention.

    Matches the deterministic ``models.layers.Block`` math exactly: same
    LN ε, same qkv/proj/fc1/fc2 param layout, exact-erf GELU for fp32 /
    tanh for bf16 (the deterministic dispatch rule in ``Mlp``).
    """
    prec = _prec(dtype)
    b, nl, c = x.shape
    h = cfg.num_heads
    hd = c // h

    # --- attention: local qkv GEMM → ring over 'ctx' → local proj -------
    y = _ln(p["norm1"], x, dtype).astype(dtype)
    qkv = (jnp.dot(y, p["attn"]["qkv"]["kernel"].astype(dtype),
                   precision=prec)
           + p["attn"]["qkv"]["bias"].astype(dtype))
    qkv = qkv.reshape(b, nl, 3, h, hd)
    q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
    out = ring_attention_local(q, k, v, hd ** -0.5, axis, n_valid=n_valid)
    out = out.transpose(0, 2, 1, 3).reshape(b, nl, c)
    out = (jnp.dot(out, p["attn"]["proj"]["kernel"].astype(dtype),
                   precision=prec)
           + p["attn"]["proj"]["bias"].astype(dtype))
    x = x + out

    # --- MLP: token-local ------------------------------------------------
    y = _ln(p["norm2"], x, dtype).astype(dtype)
    y = (jnp.dot(y, p["mlp"]["fc1"]["kernel"].astype(dtype), precision=prec)
         + p["mlp"]["fc1"]["bias"].astype(dtype))
    y = jax.nn.gelu(y.astype(jnp.float32),
                    approximate=dtype == jnp.bfloat16).astype(dtype)
    y = (jnp.dot(y, p["mlp"]["fc2"]["kernel"].astype(dtype), precision=prec)
         + p["mlp"]["fc2"]["bias"].astype(dtype))
    return x + y


# the sequential adjacency's constants — import, don't redeclare: a drift
# in ops/graph_ops would otherwise silently break the cp bit-parity
from gavit_tpu.ops.graph_ops import _EPS, _NEG_INF  # noqa: E402


def _graph_cp(cfg: ModelConfig, dtype, p, x, n: int, axis: str, adj=None):
    """One graph block on this chip's token rows (token-sharded adjacency).

    Matches the deterministic ``models.graph.GraphBlock`` math exactly
    (same LN/value/proj/gate params, same masked-selection rules as
    ``ops.graph_ops.build_adjacency``), with the row dimension sharded:
    this chip computes the [nl, N_pad] adjacency rows for ITS tokens
    against the all-gathered token blocks and aggregates against the
    gathered values. CLS (``include_cls=False``) and ring padding are
    handled as masked global columns / passed-through rows — the column
    masking preserves top-k tie order (masked entries sit at -1e30, below
    any cosine), so the selected edges equal the sequential build's.

    Args:
      x: [B, nl, C] local rows (global rows idx·nl … idx·nl+nl−1).
      n: global count of REAL tokens (incl. CLS).
      adj: optional [B, nl, N_pad] adjacency to reuse (dynamic=False).
    Returns (x, adj_local).
    """
    g = cfg.graph
    prec = _prec(dtype)
    b, nl, _ = x.shape
    idx = lax.axis_index(axis)
    S = lax.axis_size(axis)
    n_pad = nl * S
    row_g = idx * nl + jnp.arange(nl)           # [nl] global row ids
    col_g = jnp.arange(n_pad)                   # [n_pad] global col ids
    off = 0 if g.include_cls else 1             # CLS bypasses by default
    row_ok = (row_g >= off) & (row_g < n)
    col_ok = (col_g >= off) & (col_g < n)

    h = _ln(p["norm"], x, dtype).astype(dtype)
    values = (jnp.dot(h, p["value"]["kernel"].astype(dtype), precision=prec)
              + p["value"]["bias"].astype(dtype))
    v_full = lax.all_gather(values, axis, axis=1, tiled=True)  # [B,N_pad,C]

    if g.adjacency == "learned_static":
        # the [n−off, n−off] logits table is a replicated param: softmax
        # its full rows, place them in global token columns, slice this
        # chip's rows
        n_g = n - off
        table = jax.nn.softmax(
            p["adj_logits"].astype(jnp.float32) / g.temperature, axis=-1)
        table = jnp.pad(table, ((0, 0), (off, n_pad - n)))
        r = jnp.clip(row_g - off, 0, n_g - 1)
        adj_local = jnp.broadcast_to(
            jnp.where(row_ok[:, None], table[r], 0.0)[None],
            (b, nl, n_pad))
    elif adj is not None:
        adj_local = adj
    else:
        # cosine similarity of local rows vs the full sequence: normalise
        # locally (per-row op — identical values to the sequential path),
        # gather the normalised blocks
        t32 = h.astype(jnp.float32)
        t32 = t32 * lax.rsqrt(
            jnp.sum(t32 * t32, axis=-1, keepdims=True) + _EPS)
        tl = t32.astype(h.dtype)
        tf = lax.all_gather(tl, axis, axis=1, tiled=True)
        sim = jnp.einsum("bid,bjd->bij", tl, tf,
                         preferred_element_type=jnp.float32, precision=prec)
        no_self = row_g[:, None] != col_g[None, :]
        valid = col_ok[None, :] & no_self                    # [nl, n_pad]
        if g.adjacency == "dense":
            mask = jnp.broadcast_to(valid[None], sim.shape)
        elif g.adjacency == "knn":
            kk = min(g.k, (n - off) - 1)
            masked_sim = jnp.where(valid[None], sim, _NEG_INF)
            sel = jax.lax.top_k(masked_sim, kk)[1]
            mask = jnp.any(
                sel[..., None] == col_g.astype(sel.dtype), axis=-2)
            mask = mask & valid[None]
        elif g.adjacency == "threshold":
            edge = (sim > g.threshold) & valid[None]
            row_any = jnp.any(edge, axis=-1, keepdims=True)
            eye_local = (row_g[:, None] == col_g[None, :])[None]
            mask = jnp.where(row_any, edge, eye_local)
        else:
            raise ValueError(f"unknown adjacency mode: {g.adjacency!r}")
        logits = jnp.where(mask, sim / g.temperature, _NEG_INF)
        adj_local = jax.nn.softmax(logits, axis=-1)

    msg = jnp.einsum("bij,bjd->bid", adj_local.astype(dtype), v_full,
                     preferred_element_type=jnp.float32,
                     precision=prec).astype(dtype)
    msg = (jnp.dot(msg, p["proj"]["kernel"].astype(dtype), precision=prec)
           + p["proj"]["bias"].astype(dtype))
    upd = p["gate"].astype(dtype) * msg
    x = jnp.where(row_ok[None, :, None], x + upd, x)
    return x, adj_local


def ctx_forward(mesh: Mesh, cfg: ModelConfig, params, images,
                dtype=jnp.float32):
    """Deterministic ViT forward with tokens sharded over mesh axis 'ctx'.

    ``params`` is the plain VisionTransformer tree (graph blocks
    included when ``cfg.graph.enabled``). Returns fp32 logits equal to
    the sequential ``model.apply``.
    """
    if cfg.moe.enabled:
        raise ValueError("context-parallel trunk requires "
                         "moe.enabled=False (routing groups are "
                         "token-global; MoE scales via dp/EP)")
    S = mesh.shape["ctx"]
    pre = {k: params[k] for k in ("patch_embed", "cls_token", "pos_embed")}
    post = {k: params[k] for k in ("norm", "head")}
    blocks = [params[f"blocks_{i}"] for i in range(cfg.depth)]
    graph_sites = set(cfg.graph_insert_after())
    graphs = [params[f"graph_{j}"] for j in range(len(graph_sites))]

    x = _embed(cfg, dtype, pre, images)          # [B, N, C] replicated
    n = x.shape[1]
    n_pad = -(-n // S) * S
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    def body(*args):
        x_local = args[-1]
        blks = args[: cfg.depth]
        gps = args[cfg.depth: -1]
        adj = None
        g_idx = 0
        for i, p in enumerate(blks):
            x_local = _block_cp(cfg, dtype, p, x_local, n, "ctx")
            if i in graph_sites:
                x_local, new_adj = _graph_cp(
                    cfg, dtype, gps[g_idx], x_local, n, "ctx",
                    adj=adj if not cfg.graph.dynamic else None)
                if not cfg.graph.dynamic and adj is None:
                    adj = new_adj
                g_idx += 1
        # cls readout: global token 0 lives on ctx shard 0 — broadcast it
        cls = jnp.where(lax.axis_index("ctx") == 0, x_local[:, 0, :], 0.0)
        return lax.psum(cls, "ctx")

    spec = P(None, "ctx", None)
    rep = jax.tree.map(lambda _: P(), tuple(blocks) + tuple(graphs))
    cls = jax.shard_map(
        body, mesh=mesh,
        in_specs=rep + (spec,), out_specs=P(),
        check_vma=False,
    )(*blocks, *graphs, x)
    return _head(cfg, dtype, post, cls[:, None, :])


def ctx_forward_fn(mesh: Mesh, cfg: ModelConfig, dtype=jnp.float32):
    """A jittable ``fn(params, images) -> logits`` closure."""
    return functools.partial(ctx_forward, mesh, cfg, dtype=dtype)
