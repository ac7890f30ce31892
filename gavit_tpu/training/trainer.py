"""Training loop.

Mirrors the reference Trainer's surface and behavior
(``/root/reference/src/training/trainer.py``): per-step warmup+cosine LR,
AdamW with the criterion λs in a 0.1×lr group, gradient clipping of model
params at ``max_grad_norm``, per-epoch train/validate with full metric
batteries, wandb logging every ``log_every`` batches and per epoch
(including per-disease AUCs), best-val-AUC checkpointing, and early stopping
with the configured patience.

TPU-native redesign:
  * The hot path is ONE jitted function: device-side augmentation
    (uint8 → normalized, fused XLA graph) + forward (Pallas attention /
    graph kernels) + loss + backward + optimizer update, with the state
    donated (no per-step reallocation).
  * bf16 activations / fp32 params & optimizer — no GradScaler needed
    (the reference's fp16+GradScaler machinery, ``trainer.py:59-60,110-120``,
    is a CUDA artifact).
  * Data-parallel over the ICI mesh: batches arrive data-sharded, gradient
    psums are inserted by the partitioner (SURVEY.md §2.6).
  * Per-step host syncs are avoided: losses/predictions stay on device and
    transfer once per epoch (the reference syncs every batch,
    ``trainer.py:126-132``).
"""

from __future__ import annotations

import base64
import functools
import logging
import os
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from gavit_tpu.config import Config
from gavit_tpu.data.loader import device_iterator
from gavit_tpu.ops.preprocess import train_preprocess, val_preprocess
from gavit_tpu.parallel.mesh import (make_mesh, replicated_sharding,
                                     stacked_batch_sharding)
from gavit_tpu.training.losses import (
    dynamic_weighted_loss,
    get_loss_weights,
    init_criterion_params,
)
from gavit_tpu.training.optimizer import make_optimizer
from gavit_tpu.training.schedule import warmup_cosine_schedule
from gavit_tpu.utils import checkpoint as ckpt_lib
from gavit_tpu.utils.metrics import MetricCalculator
from gavit_tpu.utils.preemption import PreemptionHandler


class _Preempted(Exception):
    pass

logger = logging.getLogger(__name__)


def _take_valid(x, valid):
    """Drop wrap-pad rows from a (possibly globally-sharded) device array.

    ``valid`` is shard_batch_padded's host-side genuine-row mask (None: all
    rows genuine). A static gather — concrete indices, executed symmetrically
    on every process — because with >1 process the pad rows interleave with
    real ones, so a prefix slice would keep duplicates and drop real rows.
    """
    if valid is None or bool(valid.all()):
        return x
    return jnp.take(x, jnp.asarray(np.flatnonzero(valid)), axis=0)


def _n_valid(x, valid) -> int:
    return x.shape[0] if valid is None else int(valid.sum())


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


class Trainer:
    def __init__(
        self,
        model,
        model_params,
        train_loader,
        val_loader,
        config: Config,
        wandb_run=None,
        mesh=None,
        state: TrainState | None = None,
        start_epoch: int = 0,
    ):
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.config = config
        self.wandb = wandb_run
        self.mesh = mesh if mesh is not None else make_mesh(config.mesh)
        self._pipe = self.mesh.shape.get("pipe", 1)
        if self._pipe > 1:
            # pipeline parallelism as a config axis (r5): the train/eval
            # steps run the GPipe trunk of parallel/pp.py over this mesh.
            # Scope guards mirror pipeline_apply's (loud, at build time).
            m = config.model
            if m.moe.enabled:
                raise ValueError("mesh.pipe > 1 requires moe.enabled=false "
                                 "(homogeneous block stack; MoE scales via "
                                 "dp/EP)")
            if m.graph.enabled and not m.graph.dynamic:
                raise ValueError(
                    "mesh.pipe > 1 supports graph.dynamic=true only (the "
                    "static adjacency cache cannot ride the pipeline — "
                    "parallel/pp.py)")
        if self.mesh.shape.get("model", 1) > 1:
            # All fused kernels stay in play under TP: the trainer traces
            # inside a jax.set_mesh context, so Attention pins a
            # head-sharded layout and the head-partitioned kernel rules run
            # each chip's local heads (ops/attention.py); the fused-MLP
            # megakernel runs on each chip's Megatron hidden shard via the
            # 'f' contraction factor (ops/mlp.py — bias2 and the trailing
            # dropout follow the row-parallel psum inside models.layers.Mlp).
            # The graph kernels carry batch-partitioning rules and all
            # their params are replicated, so they are TP-safe as-is.
            moe = config.model.moe
            if moe.enabled and moe.num_experts % self.mesh.shape["model"]:
                # the EP specs shard the expert bank's leading dim over
                # 'model' — an indivisible expert count would fail at
                # device_put with an opaque GSPMD error; fail loudly here
                raise ValueError(
                    f"model.moe.num_experts={moe.num_experts} must be "
                    f"divisible by the 'model' mesh axis "
                    f"({self.mesh.shape['model']}) for expert parallelism"
                )
            # grouped-engine expert parallelism: the shard_map over
            # ('data','model') in ops/moe_grouped.py::sharded_grouped_moe
            # shards the expert bank over 'model' with a static
            # ep_capacity_factor-bounded buffer per shard — no dense
            # fallback needed (r4; guard removed).
            if config.mesh.sp and not getattr(model, "sp", False):
                # sequence parallelism: token-shard the residual stream
                # through the LN/dropout/residual segments (the constraint
                # resolves against the ambient mesh set around the jit)
                self.model = model = model.clone(sp=True)

        tr = config.training
        self.metric_calculator = MetricCalculator(train_loader.dataset.disease_names)
        self.pos_weight = jnp.asarray(train_loader.dataset.class_weights)

        # quantisation-aware training: the model fake-quantises every GEMM
        # the int8 serving path quantises, against static activation scales
        # calibrated here from real samples on the INIT params (frozen for
        # the run; checkpointed so resume keeps the identical noise model)
        self._quant: dict = {}
        if tr.qat:
            if getattr(self.model, "quant", False) != "qat":
                self.model = model = self.model.clone(quant="qat")
            self._quant = self._calibrate_qat(model_params)

        steps_per_epoch = max(1, len(train_loader))
        self.tx = make_optimizer(config, steps_per_epoch)
        self.lr_schedule = warmup_cosine_schedule(
            tr.learning_rate,
            steps_per_epoch * tr.warmup_epochs,
            steps_per_epoch * tr.epochs,
        )

        if state is None:
            params = {"model": model_params, "criterion": init_criterion_params()}
            state = TrainState(
                step=jnp.zeros((), jnp.int32),
                params=params,
                opt_state=self.tx.init(params),
            )
        # private copy: the jitted step donates the state, so the Trainer must
        # own its buffers (device_put may alias the caller's arrays, which
        # donation would then delete out from under the caller). jit (not
        # device_put) so multi-process runs can build the replicated global
        # arrays — device_put rejects non-addressable shardings.
        tp_on = self.mesh.shape.get("model", 1) > 1
        fsdp_on = (
            bool(getattr(config.mesh, "fsdp", False))
            and self.mesh.shape.get("data", 1) > 1
        )
        if tp_on or fsdp_on:
            # tensor parallel / FSDP are config changes (SURVEY §2.6):
            # params and optimizer moments carry Megatron partition specs
            # over 'model' and/or ZeRO-3 specs over 'data'
            from gavit_tpu.parallel.tp import (
                model_param_specs,
                train_state_shardings,
            )

            specs = model_param_specs(state.params["model"]) if tp_on else None
            if fsdp_on:
                from gavit_tpu.parallel.fsdp import fsdp_param_specs

                specs = fsdp_param_specs(
                    state.params["model"], self.mesh,
                    min_size=getattr(config.mesh, "fsdp_min_size", 4096),
                    base_specs=specs,
                )
            self._state_sharding = train_state_shardings(
                self.mesh, self.tx, state, model_specs=specs
            )
        else:
            self._state_sharding = replicated_sharding(self.mesh)
        copy_in = jax.jit(lambda s: s, out_shardings=self._state_sharding)
        self.state = copy_in(state)
        self.base_rng = jax.jit(
            lambda: jax.random.key(tr.seed, impl=tr.prng_impl),
            out_shardings=replicated_sharding(self.mesh),
        )()

        self.current_epoch = start_epoch
        self.start_epoch = start_epoch
        self.best_val_auc = 0.0
        self.best_epoch = 0
        self.patience_counter = 0
        self.early_stop_patience = tr.early_stopping_patience
        self.min_delta = tr.min_delta
        self.train_metrics_history: list[dict] = []
        self.val_metrics_history: list[dict] = []

        self._train_step = self._in_mesh(
            self._build_train_step(config.data.augment_affine))
        self._train_multi = self._in_mesh(self._train_multi)
        self._eval_step = self._in_mesh(self._build_eval_step())
        self._preemption: PreemptionHandler | None = None
        self._loader_state: bytes | None = None  # mid-epoch resume point

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def _in_mesh(self, fn):
        """Run ``fn`` inside a ``jax.set_mesh`` context under tensor
        parallelism, so bare-PartitionSpec sharding constraints in the model
        (Attention's head pinning, op_sharding.py) resolve against the
        trainer's mesh. Identity under data-only meshes — the dp fast path
        is untouched — except for grouped MoE, whose shard_map over the
        data axis (ops/moe_grouped.py::sharded_grouped_moe) also resolves
        against the ambient mesh; every other dp op gates on 'model' > 1
        and stays a no-op under the context."""
        moe = self.config.model.moe
        # 'auto' may resolve to grouped at the train step's per-device
        # token count (models/moe.py::resolve_moe_impl) — enter the mesh
        # context whenever that is possible; the context is harmless when
        # the resolution lands on dense (every dp op gates on 'model' > 1)
        grouped_dp = (
            moe.enabled and moe.impl in ("grouped", "auto")
            and self.mesh.shape.get("data", 1) > 1
        )
        if self.mesh.shape.get("model", 1) <= 1 and not grouped_dp:
            return fn
        mesh = self.mesh

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with jax.set_mesh(mesh):
                return fn(*args, **kwargs)

        return wrapper

    def _build_train_step(self, use_affine: bool):
        model, tx, pos_weight = self.model, self.tx, self.pos_weight
        mesh = self.mesh
        log_grad_norm = self.config.training.log_grad_norm
        accum = max(1, self.config.training.grad_accum_steps)
        # under TP/FSDP, pin the updated state to the declared layout — the
        # partitioner would otherwise be free to pick a different output
        # sharding (e.g. re-replicating ZeRO-sharded moments), breaking the
        # donation aliasing and the memory win
        state_sharding = (
            self._state_sharding
            if isinstance(self._state_sharding, TrainState) else None
        )

        quant_vars = self._quant
        moe_on = self.config.model.moe.enabled
        pipe = self._pipe
        if pipe > 1:
            from gavit_tpu.parallel.pp import pick_microbatches

            model_cfg = self.config.model
            pipe_dtype = getattr(model, "dtype", jnp.float32)
            pipe_mb = functools.partial(
                pick_microbatches, stages=pipe,
                data=self.mesh.shape.get("data", 1),
                requested=self.config.mesh.pipe_microbatches)

        def grad_fn(params, x, labels, k_drop):
            def loss_fn(params):
                if pipe > 1:
                    from gavit_tpu.parallel.pp import pipeline_apply

                    # wrap-pad ragged tails to a pipe·dp multiple (same
                    # rationale as the eval step); sliced back before the
                    # loss, so pad rows contribute nothing
                    b = x.shape[0]
                    quantum = pipe * mesh.shape.get("data", 1)
                    b_pad = -(-b // quantum) * quantum
                    xp = (x[jnp.arange(b_pad) % b] if b_pad != b else x)
                    logits = pipeline_apply(
                        mesh, model_cfg, params["model"], xp,
                        pipe_mb(b_pad), dtype=pipe_dtype,
                        deterministic=False, rng=k_drop,
                        quant=quant_vars.get("quant"))[:b]
                    aux = 0.0
                elif moe_on:
                    # mutable collection so the MoE blocks' sown auxiliary
                    # losses (load-balance + router-z, config-weighted at
                    # the sow site) reach the objective
                    from gavit_tpu.models.moe import moe_aux_loss

                    logits, mvars = model.apply(
                        {"params": params["model"], **quant_vars},
                        x,
                        deterministic=False,
                        rngs={"dropout": k_drop},
                        mutable=["moe_losses"],
                    )
                    aux = moe_aux_loss(mvars)
                else:
                    logits = model.apply(
                        {"params": params["model"], **quant_vars},
                        x,
                        deterministic=False,
                        rngs={"dropout": k_drop},
                    )
                    aux = 0.0
                total, comps = dynamic_weighted_loss(
                    params["criterion"], logits, labels, pos_weight
                )
                if moe_on:
                    # surface the (config-weighted) MoE auxiliary loss in
                    # the step metrics alongside the criterion components
                    comps = {**comps, "moe_aux": aux}
                return total + aux, (logits, comps)

            return jax.value_and_grad(loss_fn, has_aux=True)(params)

        def step_body(state: TrainState, rng, images, labels):
            step_rng = jax.random.fold_in(rng, state.step)
            k_aug, k_drop = jax.random.split(step_rng)
            if images.dtype == jnp.uint8:
                x = train_preprocess(images, k_aug, use_affine=use_affine)
            else:
                x = images

            if accum == 1:
                (loss, (logits, comps)), grads = grad_fn(
                    state.params, x, labels, k_drop
                )
            else:
                # gradient accumulation: one optimizer update from `accum`
                # sequential micro-batches — activation memory scales with
                # the micro-batch, enabling reference-scale global batches
                # (BASELINE.json configs[4]: 1024) on few chips. lax.scan
                # keeps a single compiled body; grads are averaged, which
                # equals the full-batch mean-loss gradient for equal splits.
                b = x.shape[0]
                if b % accum:
                    raise ValueError(
                        f"batch size {b} not divisible by "
                        f"grad_accum_steps={accum}"
                    )
                mb = b // accum
                # re-pin the microbatch layout after the reshape: splitting
                # the batch dim into [accum, mb] would otherwise leave the
                # 'data' axis divided ACROSS the two new dims (a split-axis
                # HloSharding the custom-partitioning decode of the fused
                # Pallas ops cannot express as a PartitionSpec, and which
                # parks accum-step parallelism on the mesh instead of using
                # every chip per microbatch). P(None, 'data') reshards once
                # so each scanned slice is cleanly batch-sharded.
                stacked = stacked_batch_sharding(mesh)
                xm = jax.lax.with_sharding_constraint(
                    x.reshape(accum, mb, *x.shape[1:]), stacked
                )
                lm = jax.lax.with_sharding_constraint(
                    labels.reshape(accum, mb, labels.shape[-1]), stacked
                )
                keys = jax.random.split(k_drop, accum)

                def body(g_acc, inp):
                    x_i, l_i, key_i = inp
                    (loss_i, (logits_i, comps_i)), g_i = grad_fn(
                        state.params, x_i, l_i, key_i
                    )
                    g_acc = jax.tree.map(jnp.add, g_acc, g_i)
                    return g_acc, (loss_i, logits_i, comps_i)

                zeros = jax.tree.map(
                    lambda p: jnp.zeros(p.shape, p.dtype), state.params
                )
                grads, (loss_m, logits_m, comps_m) = jax.lax.scan(
                    body, zeros, (xm, lm, keys)
                )
                grads = jax.tree.map(lambda g: g / accum, grads)
                loss = jnp.mean(loss_m)
                comps = jax.tree.map(jnp.mean, comps_m)
                logits = logits_m.reshape(b, -1)
            updates, new_opt_state = tx.update(
                grads, state.opt_state, state.params
            )
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                step=state.step + 1, params=new_params, opt_state=new_opt_state
            )
            if state_sharding is not None:
                new_state = jax.lax.with_sharding_constraint(
                    new_state, state_sharding
                )
            metrics = {"loss": loss, **comps}
            if log_grad_norm:
                metrics["grad_norm"] = optax.global_norm(grads["model"])
            preds = jax.nn.sigmoid(logits)
            return new_state, metrics, preds

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, rng, images, labels):
            return step_body(state, rng, images, labels)

        @partial(jax.jit, donate_argnums=(0,))
        def train_multi(state: TrainState, rng, images, labels):
            """K optimizer steps in one dispatch: images/labels are
            [K, B, ...]; lax.scan carries the train state through all K."""

            def body(state, batch):
                im, lb = batch
                state, metrics, preds = step_body(state, rng, im, lb)
                return state, (metrics, preds)

            state, (metrics, preds) = jax.lax.scan(
                body, state, (images, labels)
            )
            return state, metrics, preds  # metrics: dict of [K]; preds [K,B,C]

        self._train_multi = train_multi
        return train_step

    def _build_eval_step(self):
        model, pos_weight = self.model, self.pos_weight
        quant_vars = self._quant
        pipe, mesh = self._pipe, self.mesh
        if pipe > 1:
            from gavit_tpu.parallel.pp import pick_microbatches

            model_cfg = self.config.model
            pipe_dtype = getattr(model, "dtype", jnp.float32)
            pipe_mb = functools.partial(
                pick_microbatches, stages=pipe,
                data=mesh.shape.get("data", 1),
                requested=self.config.mesh.pipe_microbatches)

        @jax.jit
        def eval_step(params, images, labels):
            x = val_preprocess(images) if images.dtype == jnp.uint8 else images
            if pipe > 1:
                from gavit_tpu.parallel.pp import pipeline_apply

                # ragged eval tails arrive padded only to a dp multiple
                # (shard_batch_padded); the GPipe schedule needs a batch
                # admitting a valid microbatch count — wrap-pad up to a
                # pipe·dp multiple in-step and slice the logits back (pad
                # rows are dupes of real ones; their loss rows are dropped
                # by the caller's valid mask like every other pad row)
                b = x.shape[0]
                quantum = pipe * mesh.shape.get("data", 1)
                b_pad = -(-b // quantum) * quantum
                if b_pad != b:
                    idx = jnp.arange(b_pad) % b
                    xp = x[idx]
                else:
                    xp = x
                logits = pipeline_apply(
                    mesh, model_cfg, params["model"], xp,
                    pipe_mb(b_pad), dtype=pipe_dtype,
                    quant=quant_vars.get("quant"))[:b]
            else:
                logits = model.apply(
                    {"params": params["model"], **quant_vars}, x,
                    deterministic=True
                )
            # per-example losses: tail batches are wrap-padded for the mesh,
            # so the host averages over genuine rows only (this also weights
            # every sample equally instead of every batch equally)
            loss_vec, _ = dynamic_weighted_loss(
                params["criterion"], logits, labels, pos_weight,
                per_example=True,
            )
            return jax.nn.sigmoid(logits), loss_vec

        return eval_step

    # ------------------------------------------------------------------
    # epoch loops
    # ------------------------------------------------------------------

    def _log(self, data: dict):
        if self.wandb is not None:
            self.wandb.log(data)

    @staticmethod
    def _gather_host(tree):
        """Device→host transfer that works in multi-process runs, where the
        accumulated arrays are globally sharded (not fully addressable on
        any single host): all-gather across processes, plain get otherwise."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return multihost_utils.process_allgather(tree, tiled=True)
        return jax.device_get(tree)

    def _loader_state_fn(self):
        """get_state of a checkpointable train loader (grain), else None."""
        return getattr(self.train_loader, "get_state", None)

    def _chunked_batches(self):
        """Yield (is_stacked, images, labels, valid, loader_state): K host
        batches stacked into one [K, B, ...] device transfer when
        steps_per_call > 1. Ragged tail batches are wrap-padded to the mesh's
        data-axis size (``valid`` is the genuine-row mask; padded rows repeat
        real samples, so the extra gradient contribution is bounded and
        outputs are masked before metric accumulation — None means all rows
        genuine). loader_state is the iterator position AFTER pulling the
        batch (mid-epoch resume point), or None for loaders without
        get_state."""
        from gavit_tpu.data.loader import prefetched_iter
        from gavit_tpu.parallel.mesh import (
            shard_batch_padded,
            shard_stacked_batch,
        )

        state_fn = self._loader_state_fn()
        k = max(1, self.config.training.steps_per_call)
        if k == 1:
            yield from (
                (False, *batch)
                for batch in device_iterator(
                    self.train_loader, self.mesh,
                    prefetch=self.config.data.prefetch, state_fn=state_fn,
                )
            )
            return


        def host_items():
            """Host-side grouping: ('stack', imK, lbK, state) |
            ('single', im, lb, state)."""
            buf_im, buf_lb, buf_st = [], [], []
            bs = None
            for images, labels in self.train_loader:
                snap = state_fn() if state_fn is not None else None
                if bs is None:
                    bs = images.shape[0]
                if images.shape[0] == bs:
                    buf_im.append(images)
                    buf_lb.append(labels)
                    buf_st.append(snap)
                else:  # ragged tail batch — flush buffer, emit singly
                    for im, lb, st in zip(buf_im, buf_lb, buf_st):
                        yield "single", im, lb, st
                    buf_im, buf_lb, buf_st = [], [], []
                    yield "single", images, labels, snap
                    continue
                if len(buf_im) == k:
                    yield ("stack", np.stack(buf_im), np.stack(buf_lb),
                           buf_st[-1])
                    buf_im, buf_lb, buf_st = [], [], []
            for im, lb, st in zip(buf_im, buf_lb, buf_st):
                yield "single", im, lb, st

        def place(item):
            if item[0] == "stack":
                _, im, lb, st = item
                placed = shard_stacked_batch(self.mesh, (im, lb))
                return (True, *placed, None, st)
            _, im, lb, st = item
            placed, valid = shard_batch_padded(self.mesh, (im, lb))
            return (False, *placed, valid, st)

        # lookahead: keep `prefetch` placed stacks in flight so the
        # [K,B,...] transfers overlap the multi-step dispatch (the k=1 path
        # gets the same from device_iterator)
        yield from prefetched_iter(
            host_items(), place, self.config.data.prefetch
        )

    def train_epoch(self) -> dict:
        tr = self.config.training
        preds_acc, targets_acc, metric_acc = [], [], []
        n_images = 0
        self._loader_state = None  # snapshots arrive per-batch below
        t0 = time.perf_counter()

        self.train_loader.set_epoch(self.current_epoch)
        step_in_epoch = 0
        for is_stacked, images, labels, valid, loader_state in (
            self._chunked_batches()
        ):
            if is_stacked:
                self.state, metrics, preds = self._train_multi(
                    self.state, self.base_rng, images, labels
                )
                k, b = preds.shape[0], preds.shape[1]
                preds_acc.append(preds.reshape(k * b, -1))
                targets_acc.append(labels.reshape(k * b, -1))
                metric_acc.append(metrics)  # dict of [K]
                n_images += k * b
                steps_done = k
            else:
                self.state, metrics, preds = self._train_step(
                    self.state, self.base_rng, images, labels
                )
                preds_acc.append(_take_valid(preds, valid))
                targets_acc.append(_take_valid(labels, valid))
                metric_acc.append(metrics)
                n_images += _n_valid(preds, valid)
                steps_done = 1

            if loader_state is not None:
                # every sample up to and including this step's batch has been
                # trained on — the exact mid-epoch resume point
                self._loader_state = loader_state

            if self._preemption is not None and self._preemption.preempted:
                raise _Preempted()

            if step_in_epoch % tr.log_every < steps_done:
                step = int(self.state.step) - 1
                lr = float(self.lr_schedule(step))
                loss_val = np.asarray(metrics["loss"]).reshape(-1)[-1]
                logger.info(
                    f"Epoch {self.current_epoch + 1} step {step_in_epoch}: "
                    f"loss {float(loss_val):.4f}, lr {lr:.2e}"
                )
                self._log({
                    "train/batch_loss": float(loss_val),
                    "train/learning_rate": lr,
                })
            step_in_epoch += steps_done

        elapsed = time.perf_counter() - t0
        predictions = np.vstack([np.asarray(p) for p in self._gather_host(preds_acc)])
        targets = np.vstack([np.asarray(t) for t in self._gather_host(targets_acc)])
        losses = [
            {k: v for k, v in jax.tree.map(np.mean, m).items()}
            for m in jax.device_get(metric_acc)
        ]

        metrics = self.metric_calculator.calculate_metrics(targets, predictions)
        for key in ("loss", "wbce", "focal", "asl"):
            src = "loss" if key == "loss" else key
            metrics[f"loss_{key if key != 'loss' else 'total'}"] = float(
                np.mean([m[src] for m in losses])
            )
        metrics["loss"] = metrics["loss_total"]
        if losses and "moe_aux" in losses[0]:
            metrics["loss_moe_aux"] = float(
                np.mean([m["moe_aux"] for m in losses])
            )
        metrics["images_per_sec"] = n_images / max(elapsed, 1e-9)
        return metrics

    def validate(self) -> dict:
        preds_acc, targets_acc, losses = [], [], []
        for images, labels, valid, _ in device_iterator(
            self.val_loader, self.mesh, prefetch=self.config.data.prefetch
        ):
            preds, loss_vec = self._eval_step(self.state.params, images, labels)
            preds_acc.append(_take_valid(preds, valid))
            targets_acc.append(_take_valid(labels, valid))
            losses.append(_take_valid(loss_vec, valid))
        predictions = np.vstack([np.asarray(p) for p in self._gather_host(preds_acc)])
        targets = np.vstack([np.asarray(t) for t in self._gather_host(targets_acc)])
        metrics = self.metric_calculator.calculate_metrics(targets, predictions)
        metrics["loss"] = float(np.mean(
            np.concatenate([np.asarray(l) for l in self._gather_host(losses)])
        ))
        return metrics

    # ------------------------------------------------------------------
    # checkpointing
    # ------------------------------------------------------------------

    def _calibrate_qat(self, model_params, n: int = 8):
        """Static activation scales from real samples on the init params.

        Samples come straight from the dataset (not the loader — consuming
        loader iterations here would disturb mid-epoch state, and datasets
        are global so every process calibrates identical scales).
        """
        from gavit_tpu.serving import calibrate_act_scales

        ds = self.train_loader.dataset
        imgs = np.stack(
            [np.asarray(ds[i][0]) for i in range(min(n, len(ds)))]
        )
        sample = val_preprocess(jnp.asarray(imgs, jnp.uint8))
        quant = calibrate_act_scales(self.model, model_params, sample)
        logger.info(
            "QAT: calibrated %d static activation scales",
            len(jax.tree.leaves(quant)),
        )
        # replicated global arrays: multi-process checkpoint saves require
        # process-consistent non-addressable layouts (scales are identical
        # on every process — datasets are global and calibration is
        # deterministic)
        return jax.jit(
            lambda q: q, out_shardings=replicated_sharding(self.mesh)
        )(quant)

    def _state_tree(self):
        tree = {
            "step": self.state.step,
            "params": self.state.params,
            "opt_state": self.state.opt_state,
        }
        if self._quant:
            # QAT: the scales are part of the training state — resume (and
            # the int8 serving export) must see the run's exact noise model
            tree["quant"] = self._quant["quant"]
        return tree

    def save_checkpoint(self, metrics: dict, is_best: bool = False,
                        epoch_completed: bool = True):
        """``epoch_completed=False`` marks a mid-epoch (preemption) save:
        resume replays the in-progress epoch instead of skipping it."""
        save_dir = self.config.paths.save_dir
        os.makedirs(save_dir, exist_ok=True)
        meta = {
            "epoch": self.current_epoch,
            "next_epoch": self.current_epoch + (1 if epoch_completed else 0),
            "best_val_auc": float(self.best_val_auc),
            "best_epoch": int(self.best_epoch),
            "patience_counter": int(self.patience_counter),
            "metrics": {k: float(v) for k, v in metrics.items()
                        if isinstance(v, (int, float, np.floating))},
            "config": self.config.to_dict(),
        }
        loader_state = None
        if not epoch_completed and self._loader_state is not None:
            # checkpointable-iterator position: resume consumes exactly the
            # samples this run never trained on (grain loaders only). The
            # state is PER-PROCESS (each process iterates its own data
            # shard), so it is persisted as a per-process sidecar file, not
            # in the shared meta — a shared field would resume every process
            # at one writer's position, duplicating that shard and dropping
            # the others'.
            loader_state = self._loader_state
            meta["has_loader_state"] = True
        name = ckpt_lib.checkpoint_name(self.current_epoch, metrics["mean_auc"])
        if epoch_completed:
            # end-of-epoch saves persist in the background — the next epoch
            # starts immediately (the snapshot copy decouples the write from
            # the donated live state)
            ckpt_lib.save_async(
                os.path.join(save_dir, name), self._state_tree(), meta,
                also=[os.path.join(save_dir, "best_model")] if is_best else [],
            )
        else:
            # preemption saves stay synchronous: the process may be killed
            # the moment this returns
            ckpt_lib.save(os.path.join(save_dir, name), self._state_tree(),
                          meta, process_data=loader_state)
            if is_best:
                ckpt_lib.save(
                    os.path.join(save_dir, "best_model"), self._state_tree(),
                    meta, process_data=loader_state,
                )
        if is_best:
            # on the async path the write is only SCHEDULED here; the
            # on-disk confirmation is ckpt_lib.save's own log line, and
            # wait_for_saves raises if the background write failed
            verb = "Saving" if epoch_completed else "Saved"
            logger.info(
                f"{verb} new best model with AUC: {metrics['mean_auc']:.4f}"
            )

    def restore_checkpoint(self, path: str):
        """Full resume: params + optimizer + schedule step + epoch/best-AUC."""
        ckpt_lib.wait_for_saves()  # never read a half-written checkpoint
        state, meta = ckpt_lib.restore(path, self._state_tree())
        # jit (not device_put): multi-process restores need non-addressable
        # replicated global arrays
        self.state = jax.jit(
            lambda s: s, out_shardings=self._state_sharding
        )(TrainState(
            step=state["step"],
            params=state["params"],
            opt_state=state["opt_state"],
        ))
        if "quant" in state and self._quant:
            # QAT resume: adopt the checkpoint's calibrated scales (the
            # jitted steps closed over the fresh-init calibration — rebuild
            # so the run continues under the run's original noise model)
            self._quant = {"quant": state["quant"]}
            self._train_step = self._in_mesh(
                self._build_train_step(self.config.data.augment_affine))
            self._train_multi = self._in_mesh(self._train_multi)
            self._eval_step = self._in_mesh(self._build_eval_step())
        self.current_epoch = int(
            meta.get("next_epoch", int(meta.get("epoch", 0)) + 1)
        )
        self.start_epoch = self.current_epoch
        self.best_val_auc = float(meta.get("best_val_auc", 0.0))
        self.best_epoch = int(meta.get("best_epoch", 0))
        self.patience_counter = int(meta.get("patience_counter", 0))
        loader_state = None
        if meta.get("loader_state_b64"):  # pre-r3 checkpoints (shared field)
            loader_state = base64.b64decode(meta["loader_state_b64"])
        elif meta.get("has_loader_state"):
            # per-process sidecar: THIS process's iterator position
            loader_state = ckpt_lib.load_process_data(path)
            if loader_state is None:
                raise FileNotFoundError(
                    f"checkpoint {path} marks a mid-epoch save but has no "
                    f"loader state for process {jax.process_index()} — "
                    "resume with the same process count it was saved with"
                )
        if loader_state and hasattr(self.train_loader, "set_state"):
            # mid-epoch resume: position the checkpointable iterator on the
            # first unseen sample of the in-progress epoch (set_epoch is
            # idempotent, so train_epoch's own call keeps this position)
            self.train_loader.set_epoch(self.current_epoch)
            self.train_loader.set_state(loader_state)
            logger.info("Restored mid-epoch data-iterator state")
        logger.info(f"Resumed from {path} at epoch {self.current_epoch}")

    # ------------------------------------------------------------------
    # outer loop
    # ------------------------------------------------------------------

    def train(self) -> dict:
        logger.info("Starting training...")
        tr = self.config.training
        if self._preemption is None:  # tests may inject a pre-armed handler
            self._preemption = PreemptionHandler().install()
        try:
            for epoch in range(self.start_epoch, tr.epochs):
                self.current_epoch = epoch

                train_metrics = self.train_epoch()
                self.train_metrics_history.append(train_metrics)

                # reference declares eval_freq/save_freq in its config
                # (baseline_config.yaml:39-40) but never wires them
                # (trainer.py validates/saves unconditionally); here they work
                run_val = (epoch + 1) % max(1, tr.eval_freq) == 0
                if run_val:
                    val_metrics = self.validate()
                    self.val_metrics_history.append(val_metrics)
                else:
                    val_metrics = None

                lr = float(self.lr_schedule(int(self.state.step) - 1))
                epoch_log = {
                    "epoch": epoch,
                    "train/loss": train_metrics["loss"],
                    "train/mean_auc": train_metrics["mean_auc"],
                    "train/images_per_sec": train_metrics["images_per_sec"],
                    "learning_rate": lr,
                }
                if "loss_moe_aux" in train_metrics:
                    epoch_log["train/loss_moe_aux"] = (
                        train_metrics["loss_moe_aux"])
                if val_metrics is not None:
                    epoch_log["val/loss"] = val_metrics["loss"]
                    epoch_log["val/mean_auc"] = val_metrics["mean_auc"]
                self._log(epoch_log)
                for disease in self.train_loader.dataset.disease_names:
                    key = f"{disease}_auc"
                    if key in train_metrics:
                        d_log = {f"train/auc_{disease}": train_metrics[key]}
                        if val_metrics is not None and key in val_metrics:
                            d_log[f"val/auc_{disease}"] = val_metrics[key]
                        self._log(d_log)

                w = np.asarray(get_loss_weights(
                    jax.device_get(self.state.params["criterion"])
                ))
                val_str = (
                    f"Val Loss: {val_metrics['loss']:.4f}, "
                    f"Val AUC: {val_metrics['mean_auc']:.4f}, "
                    if val_metrics is not None else ""
                )
                logger.info(
                    f"Epoch {epoch + 1}/{tr.epochs} - "
                    f"Train Loss: {train_metrics['loss']:.4f}, "
                    f"Train AUC: {train_metrics['mean_auc']:.4f}, "
                    f"{val_str}"
                    f"{train_metrics['images_per_sec']:.0f} img/s, "
                    f"loss weights (wbce/focal/asl): "
                    f"{w[0]:.3f}/{w[1]:.3f}/{w[2]:.3f}"
                )

                if val_metrics is not None:
                    if val_metrics["mean_auc"] > self.best_val_auc:
                        self.best_val_auc = val_metrics["mean_auc"]
                        self.best_epoch = epoch
                        self.patience_counter = 0
                        self.save_checkpoint(val_metrics, is_best=True)
                    else:
                        self.patience_counter += 1
                elif (epoch + 1) % max(1, tr.save_freq) == 0:
                    self.save_checkpoint(train_metrics, is_best=False)

                if self.patience_counter >= self.early_stop_patience:
                    logger.info("Early stopping triggered")
                    break

                if self._preemption.preempted:
                    raise _Preempted()
        except _Preempted:
            # SIGTERM (TPU-VM preemption): save a mid-epoch checkpoint marked
            # incomplete so `--resume auto` replays the in-progress epoch —
            # including epoch 0 (a round-1 clamp made it resume at epoch 1)
            logger.warning("Preempted — saving resume checkpoint and exiting")
            last_metrics = (
                self.val_metrics_history[-1]
                if self.val_metrics_history
                else {"mean_auc": 0.0}
            )
            ckpt_lib.wait_for_saves()  # don't race an in-flight epoch save
            self.save_checkpoint(last_metrics, is_best=False,
                                 epoch_completed=False)
        except Exception as e:
            logger.error(f"Training failed with error: {e}")
            raise
        finally:
            ckpt_lib.wait_for_saves()  # all checkpoints on disk before return
            self._preemption.uninstall()
            self._preemption = None
            logger.info("Training completed!")

        last_train = self.train_metrics_history[-1] if (
            self.train_metrics_history) else {}
        last_val = self.val_metrics_history[-1] if (
            self.val_metrics_history) else {}
        return {
            "best_val_auc": float(self.best_val_auc),
            "final_train_loss": float(last_train.get("loss", float("nan"))),
            "final_train_auc": float(last_train.get("mean_auc", float("nan"))),
            "final_val_loss": float(last_val.get("loss", float("nan"))),
            "final_val_auc": float(last_val.get("mean_auc", float("nan"))),
        }
