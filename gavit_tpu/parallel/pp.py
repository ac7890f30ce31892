"""Pipeline parallelism (GPipe) for the ViT trunk.

The reference is single-device (``/root/reference/scripts/train.py:133``);
dp/tp/fsdp/sp cover every scale its model family needs on a v5e slice —
ViT-L fits one chip with room to spare. This module is the capability for
models that DON'T: depth-scaled backbones whose trunk exceeds a chip even
under ZeRO-3. It is deliberately TPU-idiomatic rather than a torch-style
stage-process design: the transformer trunk is a *homogeneous stack* of
blocks, so the per-block parameter trees are stacked along a leading layer
dim, that dim is sharded over a ``pipe`` mesh axis (each stage holds a
contiguous chunk of layers), and a GPipe schedule runs as a
``lax.scan`` over ticks inside ``shard_map``, rotating activations stage to
stage with ``lax.ppermute`` over ICI. Autodiff through scan + ppermute
yields the reverse pipeline for the backward pass — no hand-written
schedule.

Scope (asserted): the GRAPH-AUGMENTED trunk pipelines too (r4) — dynamic
graph blocks recompute their adjacency from their own input, so each is
stage-local: the stacked graph params replicate across stages and the
owning stage applies its site(s) inside the layer scan via ``lax.cond``.
Static-adjacency graph configs stay on dp/tp (the adjacency computed at
the first site is CACHED across later sites in the sequential model —
that cache would have to ride the pipeline). MoE trunks stay on dp/EP
(heterogeneous block stack). drop_path works (r5): the per-layer
linearly-decaying rates ride the stacked-layer scan as a traced operand
(sharded like the trunk), so the shared Block config applies each layer's
own rate. Since r5 pp is a CONFIG AXIS (``mesh.pipe``): the
Trainer drives this module for train AND eval steps, blocks run with
their DEFAULT (fused-kernel) impls — inside shard_map the partitioned op
wrappers see no spanning mesh axes and execute shard-locally — and
dropout is applied per (layer, tick) under training. Embedding
(patch + cls + pos) and the head (LN + linear) run replicated outside the
pipelined region. Microbatch count M ≥ stages S keeps the bubble
fraction at (S-1)/(M+S-1).

Parity with the sequential model is exact and pinned by
``tests/test_pipeline.py``: same param tree, same modules, logits and
parameter gradients equal to ``VisionTransformer.apply``.
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

# NOTE: gavit_tpu.models.layers imports from this package's op_sharding —
# importing it at module scope from inside the package __init__ chain would
# be circular, so the model modules are imported lazily in the appliers.


def make_pipe_mesh(n_stages: int, data: int = 1, devices=None) -> Mesh:
    """A ('pipe', 'data') mesh: stages × data-parallel replicas."""
    devices = devices if devices is not None else jax.devices()
    if n_stages * data > len(devices):
        raise ValueError(
            f"pipe={n_stages} × data={data} needs {n_stages * data} devices,"
            f" have {len(devices)}"
        )
    arr = np.asarray(devices[: n_stages * data]).reshape(n_stages, data)
    return Mesh(arr, ("pipe", "data"))


def split_params(params, depth: int):
    """(pre, trunk, post) from a VisionTransformer param tree.

    ``trunk`` stacks the per-block trees along a new leading layer dim —
    the dim the 'pipe' axis shards. pre/post keep their original leaves, so
    checkpoints round-trip (``merge_params`` inverts exactly).
    """
    blocks = [params[f"blocks_{i}"] for i in range(depth)]
    trunk = jax.tree.map(lambda *ls: jnp.stack(ls), *blocks)
    pre = {k: params[k] for k in ("patch_embed", "cls_token", "pos_embed")}
    post = {k: params[k] for k in ("norm", "head")}
    return pre, trunk, post


def merge_params(pre, trunk, post, depth: int) -> dict:
    """Inverse of :func:`split_params`."""
    out = dict(pre)
    out.update(post)
    for i in range(depth):
        out[f"blocks_{i}"] = jax.tree.map(lambda x: x[i], trunk)
    return out


def _vars(params, q):
    return {"params": params} if q is None else {"params": params, "quant": q}


def _embed(cfg: ModelConfig, dtype, pre, images, q=None):
    from gavit_tpu.models.layers import PatchEmbed

    x = PatchEmbed(
        patch_size=cfg.patch_size, embed_dim=cfg.embed_dim, dtype=dtype,
        quant="qat" if q is not None else False,
    ).apply(_vars(pre["patch_embed"], q), images.astype(dtype))
    b = images.shape[0]
    cls = jnp.broadcast_to(
        pre["cls_token"].astype(dtype), (b, 1, cfg.embed_dim)
    )
    x = jnp.concatenate([cls, x], axis=1)
    return x + pre["pos_embed"].astype(dtype)


def _head(cfg: ModelConfig, dtype, post, x, q=None):
    from gavit_tpu.models.layers import LN_EPS, QDense

    x = nn.LayerNorm(epsilon=LN_EPS, dtype=dtype).apply(
        {"params": post["norm"]}, x
    )
    logits = QDense(
        cfg.num_classes, dtype=dtype,
        quant="qat" if q is not None else False,
    ).apply(_vars(post["head"], q), x[:, 0].astype(dtype))
    return logits.astype(jnp.float32)


def _block_apply(cfg: ModelConfig, dtype, p, x, deterministic=True,
                 rng=None, dp_rate=None, q=None):
    from gavit_tpu.models.layers import Block

    # DEFAULT impls (r5, lifting the r3 'xla' pin): the stage body runs the
    # same fused Pallas kernels the sequential model dispatches to — inside
    # shard_map the batch/head-partitioned wrappers see no spanning mesh
    # axes and execute shard-locally, which is exactly the manual-sharding
    # contract here
    blk = Block(
        dim=cfg.embed_dim, num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio,
        qkv_bias=cfg.qkv_bias, dtype=dtype, drop=cfg.drop_rate,
        attn_drop=cfg.attn_drop_rate,
        quant="qat" if q is not None else False,
    )
    rngs = None if deterministic else {"dropout": rng}
    # dp_rate: TRACED per-layer stochastic-depth rate (the stacked-layer
    # scan shares one static Block config, so the linearly decaying rates
    # ride the scan as an operand instead — models/layers.py::drop_path
    # takes traced probabilities)
    return blk.apply(_vars(p, q), x, deterministic, rngs=rngs,
                     drop_path_override=dp_rate)


def _graph_apply(cfg: ModelConfig, dtype, p, x, deterministic=True,
                 rng=None, q=None):
    from gavit_tpu.models.graph import GraphBlock

    gb = GraphBlock(
        dim=cfg.embed_dim, cfg=cfg.graph, num_patches=x.shape[1] - 1,
        drop=cfg.drop_rate, dtype=dtype,
        quant="qat" if q is not None else False,
    )
    rngs = None if deterministic else {"dropout": rng}
    y, _ = gb.apply(_vars(p, q), x, adj=None, deterministic=deterministic,
                    rngs=rngs)
    return y


def pipeline_apply(mesh: Mesh, cfg: ModelConfig, params, images,
                   num_microbatches: int, dtype=jnp.float32,
                   deterministic: bool = True, rng=None, quant=None):
    """Forward pass with the trunk pipelined over mesh axis 'pipe'.

    ``params`` is the plain VisionTransformer tree (graph_j keys included
    when the config interleaves dynamic graph blocks). The
    batch is split into ``num_microbatches`` GPipe microbatches; stage s
    processes microbatch m at tick m + s, activations ride ``ppermute``
    between consecutive stages, and the last stage's outputs are psum-
    broadcast back (zeros everywhere else) for the replicated head.
    Differentiable end to end.

    ``deterministic=False`` (the Trainer's pp training path, r5) applies
    dropout inside the stage bodies: ``rng`` is folded per (layer, tick) so
    every microbatch of every block draws an independent mask. The dropout
    STREAM differs from the sequential model's (a different valid dropout,
    same rates) — exact-trajectory parity vs sequential holds at
    drop_rate 0 (``tests/test_pipeline.py``).

    ``quant`` (late r5): the pruned act-scale collection from
    :func:`gavit_tpu.serving.calibrate_act_scales` (the tree the QAT
    Trainer carries) — every module then runs its ``quant='qat'``
    fake-quantised GEMMs against the same static scales as the sequential
    model. Per-block scale subtrees are stacked and sharded like the
    trunk; graph-site subtrees replicate like the graph params.
    """
    if cfg.graph.enabled and not cfg.graph.dynamic:
        raise ValueError(
            "pipeline trunk supports graph.dynamic=True only: a static "
            "adjacency is computed once at the FIRST graph site and cached "
            "across later ones (models/vit.py:134-143) — that cache would "
            "have to ride the pipeline between stages; dynamic graph "
            "blocks recompute from their own input and are stage-local"
        )
    if cfg.moe.enabled:
        raise ValueError("pipeline trunk requires moe.enabled=False "
                         "(the stacked-layer scan needs a homogeneous "
                         "block stack; MoE scales via dp/EP)")
    if not deterministic and rng is None:
        raise ValueError("deterministic=False needs a dropout rng")
    S = mesh.shape["pipe"]
    if cfg.depth % S:
        raise ValueError(f"depth {cfg.depth} not divisible by {S} stages")
    M = num_microbatches
    b = images.shape[0]
    if b % M or M < S:
        raise ValueError(f"batch {b} / microbatches {M} / stages {S}: need "
                         "M | b and M >= S")

    # distinct + sorted: the sequential model collapses duplicate sites via
    # a set (models/vit.py:98) and creates one graph_j per DISTINCT site —
    # the even-spread rule can collide (e.g. depth=4, num_blocks=4)
    sites = (tuple(sorted(set(cfg.graph_insert_after())))
             if cfg.graph.enabled else ())
    pre, trunk, post = split_params(params, cfg.depth)
    # graph blocks share one param structure — stacked [G, ...] and
    # replicated over stages (they are small vs the trunk); each stage
    # applies the site(s) that fall inside its layer chunk
    graph_stack = (
        jax.tree.map(lambda *ls: jnp.stack(ls),
                     *[params[f"graph_{j}"] for j in range(len(sites))])
        if sites else jnp.zeros((0,))
    )
    # QAT: stack the per-block act-scale subtrees like the trunk (scalars,
    # so the stacked tree is [depth]-leaved) and the graph ones like the
    # graph params; embed/head subtrees stay outside the pipelined region
    use_q = quant is not None
    q_trunk = (
        jax.tree.map(lambda *ls: jnp.stack(ls),
                     *[quant[f"blocks_{i}"] for i in range(cfg.depth)])
        if use_q else jnp.zeros((0,))
    )
    q_graph = (
        jax.tree.map(lambda *ls: jnp.stack(ls),
                     *[quant[f"graph_{j}"] for j in range(len(sites))])
        if use_q and sites else jnp.zeros((0,))
    )
    x = _embed(cfg, dtype, pre, images,
               q=quant.get("patch_embed") if use_q else None)
    if not deterministic and cfg.drop_rate > 0.0:
        # the sequential model applies dropout on the embedded tokens
        # (models/vit.py:91) — mirror it here, outside the pipelined
        # region (r5 review finding #1)
        keep = jax.random.bernoulli(
            jax.random.fold_in(rng, 10 ** 6), 1.0 - cfg.drop_rate, x.shape)
        x = jnp.where(keep, x / (1.0 - cfg.drop_rate), 0.0).astype(dtype)
    mbs = x.reshape(M, b // M, *x.shape[1:])     # [M, mb, N, C]
    L = cfg.depth // S
    site_arr = jnp.asarray(sites, jnp.int32) if sites else None
    # per-layer stochastic-depth rates (linear decay, models/vit.py:100-102)
    # stacked [depth] and sharded like the trunk — each stage scans its own
    # [L] slice and threads the traced rate into the shared Block (r5:
    # lifting the drop_path_rate=0 pp restriction)
    use_dp = (not deterministic) and cfg.drop_path_rate > 0.0
    dpr = jnp.asarray(
        [cfg.drop_path_rate * i / max(cfg.depth - 1, 1)
         for i in range(cfg.depth)], jnp.float32)

    def stage_body(trunk_local, graph_local, dpr_local, q_trunk_local,
                   q_graph_local, mbs, rng):
        s = lax.axis_index("pipe")

        def run_blocks(x, t):
            def step(x, inp):
                if use_q:
                    p, loc, dp_rate, qb = inp
                else:
                    p, loc, dp_rate = inp
                    qb = None
                layer = s * L + loc
                if deterministic:
                    k_blk = k_gph = None
                else:
                    # independent masks per (layer, tick, dp shard): the
                    # microbatch at this stage at tick t is t - s, so
                    # (layer, t) keys every (block, microbatch); the
                    # 'data' fold keeps different examples on different
                    # dp shards from sharing masks (r5 review finding #2)
                    k_blk = jax.random.fold_in(
                        jax.random.fold_in(rng, layer), t)
                    if "data" in mesh.shape and mesh.shape["data"] > 1:
                        k_blk = jax.random.fold_in(
                            k_blk, lax.axis_index("data"))
                    k_gph = jax.random.fold_in(k_blk, cfg.depth + 1)
                x = _block_apply(cfg, dtype, p, x, deterministic, k_blk,
                                 dp_rate=dp_rate if use_dp else None, q=qb)
                if sites:
                    match = site_arr == layer           # [G]

                    def apply_graph(x):
                        gp = jax.tree.map(
                            lambda a: a[jnp.argmax(match)], graph_local)
                        gq = (jax.tree.map(
                            lambda a: a[jnp.argmax(match)], q_graph_local)
                            if use_q else None)
                        return _graph_apply(cfg, dtype, gp, x,
                                            deterministic, k_gph, q=gq)

                    x = lax.cond(jnp.any(match), apply_graph,
                                 lambda x: x, x)
                return x, None

            import os

            # unrolling the layer scan lets XLA fuse/pipeline across
            # blocks like the sequential model — measured 161.4 → 116.1 ms
            # fwd+bwd at pp1/ViT-B b32 (BASELINE.md pp-overhead row).
            # Default FULL unroll (0); compile time grows ~L-fold, so a
            # positive GAVIT_PP_UNROLL caps it for deep stages
            u = int(os.environ.get("GAVIT_PP_UNROLL", "0"))
            xs = (trunk_local, jnp.arange(L, dtype=jnp.int32), dpr_local)
            if use_q:
                xs = xs + (q_trunk_local,)
            x, _ = lax.scan(step, x, xs,
                            unroll=L if u <= 0 else min(u, L))
            return x

        zero = jnp.zeros_like(mbs[0])

        def tick(buf, t):
            feed = jnp.where(t < M, mbs[jnp.minimum(t, M - 1)], zero)
            y = run_blocks(jnp.where(s == 0, feed, buf), t)
            nxt = lax.ppermute(
                y, "pipe", [(i, i + 1) for i in range(S - 1)]
            )
            out = jnp.where(s == S - 1, y, zero)
            return nxt, out

        _, outs = lax.scan(tick, zero, jnp.arange(M + S - 1))
        # stage S-1 emits microbatch m at tick m + S - 1; every other
        # stage contributed zeros, so the psum is a broadcast
        return lax.psum(outs[S - 1:], "pipe")

    data_in = P(None, "data") if "data" in mesh.shape else P()
    rng_in = rng if rng is not None else jax.random.key(0)
    outs = jax.shard_map(
        stage_body, mesh=mesh,
        in_specs=(P("pipe"), P(), P("pipe"),
                  P("pipe") if use_q else P(), P(), data_in, P()),
        out_specs=data_in,
        check_vma=False,
    )(trunk, graph_stack, dpr, q_trunk, q_graph, mbs, rng_in)
    tokens = outs.reshape(b, *outs.shape[2:])
    return _head(cfg, dtype, post, tokens,
                 q=quant.get("head") if use_q else None)


def pick_microbatches(batch: int, stages: int, data: int = 1,
                      requested: int = 0) -> int:
    """GPipe microbatch count for a (global) batch.

    ``requested`` > 0 is validated and returned; 0 picks automatically:
    the largest of 4·S / 2·S / S that divides the batch AND leaves the
    microbatch divisible by the 'data' axis (each microbatch is
    batch-sharded over dp inside the stage body). More microbatches →
    smaller bubble (S-1)/(M+S-1) but smaller per-tick GEMMs; 4·S caps the
    bubble at ~(S-1)/(5S-1) ≈ 20% without shrinking tiles too far.
    """
    def ok(m):
        return (m >= stages and batch % m == 0
                and (batch // m) % max(1, data) == 0)

    if requested:
        if not ok(requested):
            raise ValueError(
                f"mesh.pipe_microbatches={requested} invalid for batch "
                f"{batch}, {stages} stages, dp={data}: need M >= stages, "
                "M | batch, dp | batch/M")
        return requested
    preferred = (4 * stages, 2 * stages, stages)
    for m in preferred:
        if ok(m):
            return m
    # ragged batches (wrap-padded eval tails): any valid count, largest
    # first within the preferred bubble range
    for m in range(4 * stages, stages - 1, -1):
        if ok(m):
            return m
    raise ValueError(
        f"no valid GPipe microbatch count for batch {batch} over "
        f"{stages} stages × dp={data} (try a batch divisible by "
        f"{4 * stages * max(1, data)})")


def pipeline_forward_fn(mesh: Mesh, cfg: ModelConfig,
                        num_microbatches: int, dtype=jnp.float32):
    """A jittable ``fn(params, images) -> logits`` closure."""
    return functools.partial(
        pipeline_apply, mesh, cfg, num_microbatches=num_microbatches,
        dtype=dtype,
    )
