"""Mixture-of-Experts MLP (V-MoE / Switch family), TPU-first.

A new model family beyond the reference backbone (the reference ships dense
ViT-S/B/L only, ``/root/reference/src/models/vit.py:125-127``): selected
transformer blocks replace their dense MLP with ``MoEMlp`` — a learned
router sends each token to its top-k experts, so parameter count scales with
``num_experts`` while per-token FLOPs stay near the dense block's. This is
the scaling recipe of V-MoE (PAPERS.md) rebuilt for XLA/TPU:

* **Static shapes everywhere.** Expert capacity ``C = ceil(k·S·cf/E)`` is a
  Python int from the (static) token count, dispatch/combine are dense
  one-hot tensors contracted with einsums — no gather/scatter with
  data-dependent sizes, nothing blocks XLA's MXU tiling. Tokens past an
  expert's capacity are *dropped*: their MLP branch contributes exactly 0
  and the block's residual passes them through unchanged (the V-MoE
  behavior; the router learns to balance via the auxiliary loss).
* **Expert parallelism is a sharding annotation.** Expert weights stack on
  a leading ``E`` dim (``fc1_kernel [E, D, F]``) and shard over the
  reserved ``model`` mesh axis (``parallel/tp.py::model_param_specs``);
  the dispatched activations ``[B, E, C, D]`` are pinned expert-sharded by
  ``ep_shard_constraint`` so GSPMD turns the dispatch/combine einsums into
  the all-to-alls of expert parallelism over ICI — no manual collectives.
* **fp32 router.** Routing probabilities, gate values, and the combine
  contraction run in fp32 regardless of compute dtype (router saturation
  in bf16 is the classic MoE instability); expert GEMMs run in the model's
  compute dtype on the MXU.
* **Load-balance + router-z auxiliary losses** are sown into the
  ``moe_losses`` collection; the Trainer adds them to the objective when
  the config enables MoE (weights ``model.moe.aux_weight`` /
  ``router_z_weight``).

Scope: dp / EP(=model axis) / fsdp compose; the pipeline/context-parallel
trunks and token merging (``models/tome.py``) assume a homogeneous dense
trunk and reject MoE configs explicitly. int8 serving quantises the dense
GEMMs (QDense) and leaves expert GEMMs in bf16.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gavit_tpu.config import MoEConfig

trunc_init = nn.initializers.truncated_normal(stddev=0.02)

# Measured engine crossover for the UNFUSED grouped engine (BASELINE.md r4
# scaling probe, commits 1d26830/c0a2103): its routing/gather machinery is
# ~fixed per step while the slot-padding waste it reclaims scales with
# tokens — grouped wins at b128-class steps (T = 128·197·2 = 50432 routed
# pairs/device: 261.8 vs 283.8 ms), dense below (b64, T = 25216).
# Threshold = the midpoint of the measured bracket; override for probes
# via GAVIT_MOE_AUTO_PAIRS. With the r5 FUSED megakernel available
# (ops/moe_fused.py — TPU, not kill-switched) the crossover MOVES DOWN
# rather than disappearing: fused grouped beats dense at b64/b128 (112.0
# vs 130.5 ms, 211.5 vs 283.6 — logs/r5_moe_fused.log) but dense still
# wins at b16-class steps (42.5 vs 46.1, logs/r5_moe_b16.log) where the
# routing/grouping machinery outweighs the reclaimed slot padding.
# FUSED_MIN_PAIRS = midpoint of the measured (b16, b64) bracket.
GROUPED_MIN_PAIRS = 37824
FUSED_MIN_PAIRS = 15760


def _auto_threshold() -> int:
    import os

    return int(os.environ.get("GAVIT_MOE_AUTO_PAIRS", GROUPED_MIN_PAIRS))


_logged_choices: set = set()


def resolve_moe_impl(impl: str, pairs: int) -> str:
    """Resolve ``model.moe.impl`` for one traced shape.

    Args:
      impl:  'dense' | 'grouped' (explicit — returned unchanged) | 'auto'.
      pairs: per-device routed (token, choice) pairs = (B/dp)·S·k for the
        shape being traced.

    'auto' encodes the measured crossover: the dropless grouped engine
    above the threshold, the static-capacity dense engine below it —
    ``FUSED_MIN_PAIRS`` when the fused megakernel is live (TPU),
    ``GROUPED_MIN_PAIRS`` otherwise. Resolution is per trace shape, so one config picks
    grouped for the b128 train step and dense for a b64 serving batch.
    Caveat: a ragged eval tail batch can resolve to the other engine than
    the full batches (the engines differ in drop semantics at saturated
    experts) — pin the impl explicitly when strict uniformity matters.
    """
    if impl != "auto":
        if impl not in ("dense", "grouped"):
            raise ValueError(f"unknown model.moe.impl {impl!r}")
        return impl
    from gavit_tpu.ops.moe_fused import use_fused

    if use_fused(0.0, True, None):
        # fused megakernel available: the crossover moves down to
        # b16/b64-class (FUSED_MIN_PAIRS), not away (r5, b16 probe)
        import os

        thresh = int(os.environ.get("GAVIT_MOE_AUTO_PAIRS",
                                    FUSED_MIN_PAIRS))
        choice = "grouped" if pairs >= thresh else "dense"
    else:
        choice = "grouped" if pairs >= _auto_threshold() else "dense"
    key = (pairs, choice)
    if key not in _logged_choices:
        _logged_choices.add(key)
        import logging

        logging.getLogger(__name__).info(
            "moe.impl=auto -> %s (%d routed pairs/device, threshold %d)",
            choice, pairs, _auto_threshold())
    return choice


def _mm_precision(dtype):
    if dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


def expert_capacity(tokens: int, num_experts: int, k: int,
                    capacity_factor: float) -> int:
    """Static per-expert buffer size: ceil(k·S·cf / E), clamped to [1, S]."""
    cap = int(np.ceil(k * tokens * capacity_factor / num_experts))
    return max(1, min(cap, tokens))


def router_topk(logits, k: int, *, normalize_gates: bool = True):
    """fp32 softmax-top-k routing + the auxiliary losses.

    Args:
      logits: [G, S, E] router logits (any float dtype; promoted to fp32).
    Returns:
      gate_vals: [G, S, k] fp32 gates (renormalised when requested).
      gate_idx:  [G, S, k] int32 expert choices.
      aux:       dict of scalar auxiliary losses: ``load_balance`` (Switch
        eq. 4–6: E · Σ_e fraction_dispatched_e · mean_prob_e) and
        ``router_z`` (mean logsumexp² — keeps logits from drifting).
    """
    e = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)                     # [g,s,e]
    gate_vals, gate_idx = jax.lax.top_k(probs, k)               # [g,s,k]
    if normalize_gates:
        gate_vals = gate_vals / jnp.sum(gate_vals, -1, keepdims=True)
    top1 = jax.nn.one_hot(gate_idx[..., 0], e, dtype=jnp.float32)
    frac = jnp.mean(top1, axis=1)                               # [g,e]
    mean_prob = jnp.mean(probs, axis=1)                         # [g,e]
    load_balance = e * jnp.mean(jnp.sum(frac * mean_prob, axis=-1))
    router_z = jnp.mean(jax.nn.logsumexp(logits, axis=-1) ** 2)
    aux = {"load_balance": load_balance, "router_z": router_z}
    return gate_vals, gate_idx.astype(jnp.int32), aux


def router_dispatch(logits, k: int, capacity: int, *,
                    normalize_gates: bool = True):
    """Top-k token→expert assignment with static capacity.

    Args:
      logits: [G, S, E] router logits (any float dtype; promoted to fp32).
    Returns:
      combine:  [G, S, E, C] fp32 — combine[g,s,e,c] is token s's gate value
        if it occupies expert e's slot c, else 0. ``dispatch = combine > 0``.
      aux:      dict of scalar auxiliary losses (see :func:`router_topk`).

    Priority is choice-major (every token's first choice is placed before
    any second choice), position within a choice is token order — the
    standard deterministic tie-break, and XLA-friendly: one cumsum over a
    [G, k·S, E] one-hot, no sorting.
    """
    g, s, e = logits.shape
    gate_vals, gate_idx, aux = router_topk(
        logits, k, normalize_gates=normalize_gates)
    masks = jax.nn.one_hot(gate_idx, e, dtype=jnp.float32)      # [g,s,k,e]

    # position of each (token, choice) in its expert's queue, choice-major
    flat = jnp.transpose(masks, (0, 2, 1, 3)).reshape(g, k * s, e)
    pos_flat = jnp.cumsum(flat, axis=1) - flat                  # [g,k*s,e]
    pos = jnp.transpose(pos_flat.reshape(g, k, s, e), (0, 2, 1, 3))
    keep = masks * (pos < capacity)                             # [g,s,k,e]
    # dropped (token, choice) pairs land on slot 0 here, but their gate is
    # zeroed by ``keep`` in ``gated`` below, so they contribute nothing
    slot = jnp.sum(pos * keep, axis=-1).astype(jnp.int32)       # [g,s,k]
    slot_oh = jax.nn.one_hot(slot, capacity, dtype=jnp.float32)  # [g,s,k,c]
    gated = keep * gate_vals[..., None]                         # [g,s,k,e]
    combine = jnp.einsum("gske,gskc->gsec", gated, slot_oh,
                         precision=jax.lax.Precision.HIGHEST)
    return combine, aux


def ep_shard_constraint(x, expert_dim: int = 1, axis: str = "model",
                        batch_axis: str = "data"):
    """Pin a dispatched-activation tensor expert-sharded under EP (no-op
    otherwise — same ambient-abstract-mesh pattern as
    ``parallel/op_sharding.py::head_shard_constraint``). The constraint on
    the [B, E, C, D] buffers around the expert GEMMs is what makes GSPMD
    lower the dispatch/combine einsums as all-to-alls instead of gathering
    the expert weights."""
    from jax.sharding import PartitionSpec as P

    from gavit_tpu.parallel.op_sharding import tp_axis_in_context

    if not tp_axis_in_context(axis):
        return x
    mesh = jax.sharding.get_abstract_mesh()
    if x.shape[expert_dim] % mesh.shape[axis]:
        return x  # indivisible expert count: replicated fallback is correct
    entries = [None] * x.ndim
    entries[expert_dim] = axis
    if batch_axis in mesh.shape:
        entries[0] = batch_axis
    return jax.lax.with_sharding_constraint(x, P(*entries))


class MoEMlp(nn.Module):
    """Drop-in MoE replacement for ``models.layers.Mlp``.

    Input/output [B, N, D]; each image's N tokens form one routing group
    (capacity is per image — batch-size invariant, and the group dim shards
    cleanly along 'data'). Sown scalars land in the ``moe_losses``
    collection (a no-op unless the caller marks it mutable, so eval/serving
    paths pay nothing).
    """

    cfg: MoEConfig
    hidden_dim: int
    out_dim: int
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        g, s, d = x.shape
        e, k = cfg.num_experts, cfg.k
        if k > e:
            raise ValueError(
                f"model.moe.k={k} cannot exceed num_experts={e}")
        prec = _mm_precision(self.dtype)
        cap = expert_capacity(s, e, k, cfg.capacity_factor)

        router = self.param("router", trunc_init, (d, e), jnp.float32)
        logits = jnp.dot(x.astype(jnp.float32), router,
                         precision=jax.lax.Precision.HIGHEST)

        w1 = self.param("fc1_kernel", trunc_init, (e, d, self.hidden_dim),
                        jnp.float32)
        b1 = self.param("fc1_bias", nn.initializers.zeros_init(),
                        (e, self.hidden_dim), jnp.float32)
        w2 = self.param("fc2_kernel", trunc_init, (e, self.hidden_dim,
                        self.out_dim), jnp.float32)
        b2 = self.param("fc2_bias", nn.initializers.zeros_init(),
                        (e, self.out_dim), jnp.float32)

        # exact erf whenever gradients flow; tanh on the deterministic bf16
        # path — the same dispatch rule (and rationale) as the dense Mlp
        approx = self.dtype == jnp.bfloat16 and deterministic

        mesh = jax.sharding.get_abstract_mesh()
        dp = mesh.shape.get("data", 1) if mesh is not None else 1
        impl = resolve_moe_impl(
            cfg.impl, (g // max(1, dp)) * s * k)

        if impl == "grouped":
            # dropless grouped-GEMM execution (ops/moe_grouped.py): no
            # capacity, ragged expert GEMMs over exactly the routed rows.
            # Under a >1 'model' mesh axis the engine runs expert-parallel:
            # local-expert grouping into a static ep_capacity_factor-bounded
            # buffer + one psum combine (no all-to-all — see the module doc)
            from gavit_tpu.ops.moe_grouped import sharded_grouped_moe

            gate_vals, gate_idx, aux = router_topk(
                logits, k, normalize_gates=cfg.normalize_gates)
            self.sow("moe_losses", "aux",
                     cfg.aux_weight * aux["load_balance"]
                     + cfg.router_z_weight * aux["router_z"])
            use_drop = not deterministic and self.drop > 0.0
            key = (self.make_rng("dropout") if use_drop
                   else jax.random.PRNGKey(0))
            fn = functools.partial(
                sharded_grouped_moe,
                ep_capacity_factor=cfg.ep_capacity_factor,
                drop=self.drop, deterministic=deterministic,
                approx_gelu=approx)
            if cfg.grouped_remat and not deterministic:
                # the [T, hidden] ragged-GEMM residuals dominate the grouped
                # engine's footprint (+1.2 GiB over dense at ViT-B b128 E=8,
                # logs/r3_moe_mem.log — an OOM on a 16 GiB chip); recompute
                # them in the backward instead of storing them. Dropout
                # masks regenerate identically from the same key.
                fn = jax.checkpoint(fn)
            out = fn(
                x.astype(self.dtype), gate_vals, gate_idx,
                w1.astype(self.dtype), b1.astype(self.dtype),
                w2.astype(self.dtype), b2.astype(self.dtype), key)
            return out.astype(self.dtype)

        combine, aux = router_dispatch(
            logits, k, cap, normalize_gates=cfg.normalize_gates)
        self.sow("moe_losses", "aux",
                 cfg.aux_weight * aux["load_balance"]
                 + cfg.router_z_weight * aux["router_z"])

        dispatch = (combine > 0).astype(self.dtype)             # [g,s,e,c]
        xd = jnp.einsum("gsec,gsd->gecd", dispatch, x.astype(self.dtype),
                        precision=prec)
        xd = ep_shard_constraint(xd)
        h = jnp.einsum("gecd,edf->gecf", xd, w1.astype(self.dtype),
                       precision=prec)
        h = h + b1.astype(self.dtype)[None, :, None, :]
        h = jax.nn.gelu(h, approximate=approx)
        h = self._dropout(h, deterministic)
        y = jnp.einsum("gecf,efd->gecd", h, w2.astype(self.dtype),
                       precision=prec)
        y = y + b2.astype(self.dtype)[None, :, None, :]
        y = self._dropout(y, deterministic)
        y = ep_shard_constraint(y)
        # combine: each slot holds at most one token, so its gate is a
        # per-slot scalar — scale the expert outputs by it (fp32 gates,
        # elementwise), then contract with the BINARY dispatch one-hot in
        # the compute dtype. Algebraically identical to contracting with
        # the gated combine tensor, but the big [g,s,ec]×[g,ec,d] matmul
        # runs at MXU bf16 rate instead of as a fp32-HIGHEST pass
        # (measured on TPU: the fp32 combine was a chunk of the MoE step).
        slot_gate = jnp.sum(combine, axis=1)                    # [g,e,c]
        y = (y.astype(jnp.float32) * slot_gate[..., None]).astype(self.dtype)
        out = jnp.einsum("gsec,gecd->gsd", dispatch, y, precision=prec)
        return out.astype(self.dtype)

    def _dropout(self, x, deterministic):
        if deterministic or self.drop == 0.0:
            return x
        keep = 1.0 - self.drop
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, x.shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def upcycle_params(dense_params: dict, moe_params: dict,
                   model_cfg) -> dict:
    """Sparse upcycling (Komatsuzaki et al., PAPERS.md family): initialise
    an MoE param tree from a TRAINED dense tree.

    For every MoE site, each expert starts as a copy of the dense block's
    MLP (`fc1`/`fc2` tiled onto the leading E dim) and the router starts at
    zero — uniform routing. All non-MoE leaves copy from the dense tree
    verbatim, so the upcycled model continues training from the dense
    model's function: with ``normalize_gates`` (default) and
    ``capacity_factor >= num_experts / k`` (no token ever dropped under a
    uniform router), the upcycled forward is EXACTLY the dense forward —
    pinned by ``tests/test_moe.py::test_upcycled_moe_equals_dense``. With a
    smaller capacity factor the equality is approximate until the router
    differentiates.

    Args:
      dense_params: param tree of the dense model (same cfg, moe disabled).
      moe_params:   freshly initialised param tree of the MoE model
                    (provides the target structure/shapes).
      model_cfg:    the MoE ``ModelConfig`` (for the site list).
    Returns a new param tree with the MoE model's structure.
    """
    e = model_cfg.moe.num_experts
    sites = set(model_cfg.moe_sites())

    def copy_matching(dst: dict, src: dict) -> dict:
        res = {}
        for key, val in dst.items():
            if key in src and isinstance(val, dict):
                res[key] = copy_matching(val, src[key])
            elif key in src and jnp.shape(val) == jnp.shape(src[key]):
                res[key] = src[key]
            else:
                res[key] = val
        return res

    out = copy_matching(moe_params, dense_params)
    for i in sites:
        blk = dict(out[f"blocks_{i}"])
        dense_mlp = dense_params[f"blocks_{i}"]["mlp"]
        tile = lambda a: jnp.tile(a[None], (e,) + (1,) * jnp.ndim(a))
        blk["moe"] = {
            "router": jnp.zeros_like(blk["moe"]["router"]),
            "fc1_kernel": tile(dense_mlp["fc1"]["kernel"]),
            "fc1_bias": tile(dense_mlp["fc1"]["bias"]),
            "fc2_kernel": tile(dense_mlp["fc2"]["kernel"]),
            "fc2_bias": tile(dense_mlp["fc2"]["bias"]),
        }
        out[f"blocks_{i}"] = blk
    return out


def moe_aux_loss(mutated_vars: dict) -> jax.Array:
    """Sum every sown MoE auxiliary scalar (already config-weighted)."""
    leaves = jax.tree.leaves(mutated_vars.get("moe_losses", {}))
    if not leaves:
        return jnp.float32(0.0)
    return jnp.sum(jnp.stack([jnp.asarray(v, jnp.float32) for v in leaves]))
