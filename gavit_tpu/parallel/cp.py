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
  * scope mirrors `parallel/pp.py`: the homogeneous trunk (graph blocks
    stay on dp/tp — kNN adjacency is token-global), deterministic blocks,
    XLA-einsum attention inside the manual region. Differentiable end to
    end (autodiff of scan+ppermute = the reverse ring).

Parity is pinned by ``tests/test_context_parallel.py``: logits equal to
``VisionTransformer.apply`` on the same param tree, including a ctx×data
mesh and a token count that does NOT divide the axis (pad path).
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


def ctx_forward(mesh: Mesh, cfg: ModelConfig, params, images,
                dtype=jnp.float32):
    """Deterministic ViT forward with tokens sharded over mesh axis 'ctx'.

    ``params`` is the plain VisionTransformer tree (graph disabled).
    Returns fp32 logits equal to the sequential ``model.apply``.
    """
    if cfg.graph.enabled:
        raise ValueError("context-parallel trunk requires "
                         "graph.enabled=False (kNN adjacency is "
                         "token-global; use dp/tp)")
    if cfg.moe.enabled:
        raise ValueError("context-parallel trunk requires "
                         "moe.enabled=False (routing groups are "
                         "token-global; MoE scales via dp/EP)")
    S = mesh.shape["ctx"]
    pre = {k: params[k] for k in ("patch_embed", "cls_token", "pos_embed")}
    post = {k: params[k] for k in ("norm", "head")}
    blocks = [params[f"blocks_{i}"] for i in range(cfg.depth)]

    x = _embed(cfg, dtype, pre, images)          # [B, N, C] replicated
    n = x.shape[1]
    n_pad = -(-n // S) * S
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    def body(*args):
        x_local = args[-1]
        blks = args[:-1]
        for p in blks:
            x_local = _block_cp(cfg, dtype, p, x_local, n, "ctx")
        # cls readout: global token 0 lives on ctx shard 0 — broadcast it
        cls = jnp.where(lax.axis_index("ctx") == 0, x_local[:, 0, :], 0.0)
        return lax.psum(cls, "ctx")

    spec = P(None, "ctx", None)
    rep = jax.tree.map(lambda _: P(), tuple(blocks))
    cls = jax.shard_map(
        body, mesh=mesh,
        in_specs=rep + (spec,), out_specs=P(),
        check_vma=False,
    )(*blocks, x)
    return _head(cfg, dtype, post, cls[:, None, :])


def ctx_forward_fn(mesh: Mesh, cfg: ModelConfig, dtype=jnp.float32):
    """A jittable ``fn(params, images) -> logits`` closure."""
    return functools.partial(ctx_forward, mesh, cfg, dtype=dtype)
