"""Inference / serving layer.

The reference's only inference surface is offline batch evaluation
(``/root/reference/scripts/evaluate.py:104-153``). This module adds the
production path the north star's latency metric implies:

* ``Predictor`` — checkpoint → jitted end-to-end predict function
  (uint8 NHWC in, per-disease sigmoid probabilities out), with
  * batch-size **bucketing** (requests padded up to the nearest bucket so
    every shape is compiled once — no recompiles in steady state),
  * device-resident weights (optionally bf16 for 2× HBM-bandwidth
    headroom; logits always fp32),
  * fused preprocessing (normalise inside the jit, uint8 on the wire), and
  * a latency tracker reporting p50/p95/p99 over the serve lifetime.
* ``Predictor.predict_proba`` — numpy in/out convenience for host callers.
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from gavit_tpu.config import Config
from gavit_tpu.data.dataset import DISEASE_NAMES
from gavit_tpu.models.vit import build_model, init_params
from gavit_tpu.ops.preprocess import val_preprocess

logger = logging.getLogger(__name__)

DEFAULT_BUCKETS = (1, 8, 32, 128)

# latency/batch-size samples kept for percentile windows (the deque bound
# keeps a long-lived server's footprint flat)
_STATS_WINDOW = 4096


def _latency_window():
    from collections import deque

    return deque(maxlen=_STATS_WINDOW)


def _record_latency(obj, ms: float) -> None:
    """Thread-safe window append + lifetime count (ThreadingHTTPServer
    handler threads call predict concurrently in direct — non-coalesced —
    serving; `+= 1` is a non-atomic read-modify-write)."""
    with obj._stats_lock:
        obj._latencies_ms.append(ms)
        obj._latency_count += 1


def _latency_stats(obj) -> dict:
    # snapshot under the lock: iterating the deque (np.asarray) while a
    # handler thread appends raises "deque mutated during iteration"
    with obj._stats_lock:
        if not obj._latencies_ms:
            return {}
        # percentiles over the sliding window (a long-lived server would
        # otherwise grow the sample list one float per request, forever,
        # and early warmup calls would skew lifetime percentiles anyway);
        # count is the true lifetime total
        arr = np.asarray(obj._latencies_ms)
        count = obj._latency_count
    return {
        "count": int(count),
        "window": int(arr.size),
        "p50_ms": float(np.percentile(arr, 50)),
        "p95_ms": float(np.percentile(arr, 95)),
        "p99_ms": float(np.percentile(arr, 99)),
        "mean_ms": float(arr.mean()),
    }


def validate_images(images_u8, image_size: int) -> np.ndarray:
    """uint8 [S,S,3] or [N,S,S,3] → validated [N,S,S,3] ndarray."""
    images_u8 = np.asarray(images_u8, np.uint8)
    if images_u8.ndim == 3:
        images_u8 = images_u8[None]
    if images_u8.shape[1:] != (image_size, image_size, 3):
        raise ValueError(
            f"expected images [N, {image_size}, {image_size}, 3] uint8, "
            f"got {images_u8.shape} (resize on host before predicting)"
        )
    return images_u8


def _bucketed_predict(images_u8, buckets, image_size, call) -> np.ndarray:
    """Shared serve loop: validate, chunk past the top bucket, pad each
    chunk up to its bucket, run ``call(chunk)``, slice the pads back off."""
    images_u8 = validate_images(images_u8, image_size)
    n, top = images_u8.shape[0], buckets[-1]
    outs = []
    for start in range(0, n, top):
        chunk = images_u8[start : start + top]
        m = chunk.shape[0]
        b = next((bb for bb in buckets if m <= bb), top)
        if m < b:
            chunk = np.concatenate(
                [chunk, np.zeros((b - m,) + chunk.shape[1:], np.uint8)]
            )
        outs.append(np.asarray(call(chunk))[:m])
    return np.concatenate(outs)


def calibrate_int8(model, params, sample_x, *, n_batches: int = 1) -> dict:
    """Build the static-PTQ "quant" collection: per-tensor activation scales
    observed on sample batches + per-column pre-quantised weights.

    Replaces dynamic PTQ's per-call absmax/round passes (which made int8
    LOSE to bf16 — BASELINE.md): weights are quantised once here, and the
    activation quantisation at serve time is a single fused mul/round/cast.

    ``sample_x``: normalised model input [N, H, W, C] (or a list of such
    batches). Returns ``{"quant": tree}`` to merge into apply() variables.
    """
    from gavit_tpu.ops.quant import quantize_rowwise

    batches = sample_x if isinstance(sample_x, (list, tuple)) else [sample_x]
    stats = None
    for x in batches[:n_batches] if n_batches else batches:
        _, out = model.apply(
            {"params": params}, x, deterministic=True,
            mutable=["quant_stats"],
        )
        s = out["quant_stats"]
        stats = s if stats is None else jax.tree.map(jnp.maximum, stats, s)

    def build(stats_node, params_node):
        quant = {}
        if "act_absmax" in stats_node:
            absmax = stats_node["act_absmax"]
            quant["act_scale"] = jnp.maximum(absmax, 1e-8) / 127.0
            w_q, w_scale = quantize_rowwise(params_node["kernel"], axis=0)
            quant["w_q"], quant["w_scale"] = w_q, w_scale
        for key, val in stats_node.items():
            if key != "act_absmax":
                quant[key] = build(val, params_node[key])
        return quant

    return {"quant": build(stats, params)}


def calibrate_act_scales(model, params, sample_x, *, n_batches: int = 1):
    """The activation-scale half of :func:`calibrate_int8` — for QAT.

    Weights keep training after calibration, so the frozen ``w_q`` the full
    collection would carry is useless (and dangerous) there; QAT reads only
    ``act_scale`` and fake-quantises the live weight per call. Returns
    ``{"quant": tree}`` with act_scale leaves only.
    """
    full = calibrate_int8(model, params, sample_x, n_batches=n_batches)

    def prune(node):
        out = {}
        for key, val in node.items():
            if key == "act_scale":
                out[key] = val
            elif isinstance(val, dict):
                out[key] = prune(val)
        return out

    return {"quant": prune(full["quant"])}


def export_quant(params, act_scales: dict) -> dict:
    """Serving "quant" collection for a (QAT-)trained checkpoint: quantise
    the FINAL weights per column and pair them with the act scales the
    model trained against — the int8 path then reconstructs exactly the
    values QAT trained through (up to int32-vs-fp accumulation).

    ``act_scales``: the ``{"quant": ...}`` tree from
    :func:`calibrate_act_scales` (checkpointed by the QAT trainer).
    """
    from gavit_tpu.ops.quant import quantize_rowwise

    def build(scale_node, params_node):
        quant = {}
        for key, val in scale_node.items():
            if key == "act_scale":
                quant["act_scale"] = val
                w_q, w_scale = quantize_rowwise(params_node["kernel"],
                                                axis=0)
                quant["w_q"], quant["w_scale"] = w_q, w_scale
            else:
                quant[key] = build(val, params_node[key])
        return quant

    return {"quant": build(act_scales["quant"], params)}


class Predictor:
    def __init__(
        self,
        config: Config,
        checkpoint_path: str | None = None,
        *,
        precision: str = "fp32",
        buckets: tuple = DEFAULT_BUCKETS,
        params=None,
        mesh=None,
        tome_r: int = 0,
    ):
        """``mesh`` (optional ``jax.sharding.Mesh``) serves over multiple
        chips: batches shard along 'data' (a v5e-8 cuts a full-val-set sweep
        ~8×), and with a >1 'model' axis the params live Megatron-sharded
        and the head-partitioned fused kernels run each chip's local heads
        — for models whose replicated weights crowd a chip's HBM, or to
        split one request's compute across chips for latency.
        """
        import dataclasses

        model_cfg = dataclasses.replace(config.model, drop_rate=0.0)
        self.model = build_model(model_cfg, precision=precision)
        self.config = config
        self.mesh = mesh
        self._n_data = 1 if mesh is None else mesh.shape.get("data", 1)
        if self._n_data > 1:
            # every compiled shape must divide the data axis
            buckets = tuple(
                -(-b // self._n_data) * self._n_data for b in buckets
            )
        self.buckets = tuple(sorted(set(buckets)))
        self.disease_names = DISEASE_NAMES[: model_cfg.num_classes]

        qat_scales = None
        if params is None:
            params = init_params(self.model, jax.random.key(0))
            if checkpoint_path:
                from gavit_tpu.utils import checkpoint as ckpt_lib

                state, _ = ckpt_lib.restore_unstructured(checkpoint_path)
                params = jax.tree.map(
                    lambda tmpl, v: jnp.asarray(v, tmpl.dtype),
                    params,
                    state["params"]["model"],
                )
                if "quant" in state:
                    # QAT checkpoint: the scales the model TRAINED against
                    qat_scales = {"quant": jax.tree.map(
                        jnp.asarray, state["quant"])}
        if mesh is None:
            self.params = jax.device_put(params)
            self._batch_sharding = None
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if mesh.shape.get("model", 1) > 1:
                from gavit_tpu.parallel.tp import shard_model_params

                self.params = shard_model_params(params, mesh)
                if config.mesh.sp and not self.model.sp:
                    # sequence parallelism for TP serving (config mesh.sp)
                    self.model = self.model.clone(sp=True)
            else:
                self.params = jax.device_put(
                    params, NamedSharding(mesh, P())
                )
            self._batch_sharding = NamedSharding(mesh, P("data"))
        self._tome_r = int(tome_r)
        self._variables = {"params": self.params}
        self._is_int8 = precision == "int8"
        self._has_qat_scales = qat_scales is not None
        if self._is_int8 and qat_scales is not None:
            # serve under the exact noise model QAT trained through:
            # final weights quantised per column + the trained act scales —
            # no warmup/sample calibration needed (and none should run,
            # fresh scales would diverge from the trained ones)
            quant = export_quant(params, qat_scales)
            self._variables = {"params": self.params,
                               **jax.device_put(quant)}
            logger.info("int8 predictor using QAT-trained scales")

        @jax.jit
        def predict_fn(variables, images_u8):
            x = val_preprocess(images_u8)
            if self._tome_r:
                # token-merging acceleration (models/tome.py): r most
                # similar token pairs merged after every block —
                # training-free throughput/accuracy dial; composes with
                # static-int8 (the quant collection threads per block)
                from gavit_tpu.models.tome import tome_forward

                logits = tome_forward(
                    model_cfg, variables["params"], x, self._tome_r,
                    dtype=self.model.dtype,
                    quant=variables.get("quant"),
                )
            else:
                logits = self.model.apply(variables, x, deterministic=True)
            return jax.nn.sigmoid(logits.astype(jnp.float32))

        self._predict_fn = predict_fn
        self._latencies_ms = _latency_window()
        self._latency_count = 0
        import threading

        self._stats_lock = threading.Lock()

    def _predict(self, _params_ignored, images_u8):
        if self._is_int8 and self._tome_r and "quant" not in self._variables:
            raise RuntimeError(
                "int8 + tome_r serves static scales only: call calibrate() "
                "or warmup() before predicting (the merged trunk has no "
                "dynamic-PTQ calibration pass)"
            )
        if self.mesh is None:
            return self._predict_fn(self._variables, images_u8)
        # shard the batch over 'data'; under a >1 'model' axis the mesh
        # context lets the fused attention kernels pin head-sharded layouts
        # (parallel/op_sharding.py::head_shard_constraint)
        images_u8 = jax.device_put(
            jnp.asarray(images_u8), self._batch_sharding
        )
        with jax.set_mesh(self.mesh):
            return self._predict_fn(self._variables, images_u8)

    def calibrate(self, images_u8: np.ndarray, *, force: bool = False):
        """Static PTQ calibration (int8 predictors): observe activation
        ranges on representative images, pre-quantise the weights, and switch
        the serve path to static scales (no per-call absmax passes).

        A QAT checkpoint already carries the scales the model TRAINED
        against; replacing them with fresh sample statistics would reopen
        the train/serve skew QAT exists to close (8.1× — BASELINE.md), so
        calibration is refused there unless ``force=True``.
        """
        if not self._is_int8:
            return
        if self._has_qat_scales and not force:
            logger.warning(
                "calibrate() skipped: predictor holds QAT-trained scales "
                "(pass force=True to discard them for PTQ scales)"
            )
            return
        x = val_preprocess(jnp.asarray(np.asarray(images_u8, np.uint8)))
        quant = calibrate_int8(self.model, self.params, x)
        self._variables = {"params": self.params, **jax.device_put(quant)}
        logger.info("int8 predictor calibrated (static scales)")

    # ------------------------------------------------------------------

    def warmup(self):
        """Pre-compile every bucket shape (avoids first-request stalls)."""
        s = self.config.data.image_size
        if self._is_int8 and "quant" not in self._variables:
            # fall-back calibration on noise images so warmup compiles the
            # final (static-scale) serve path; call calibrate() with real
            # images first for production-quality scales
            rng = np.random.default_rng(0)
            self.calibrate(rng.integers(0, 256, (8, s, s, 3), np.uint8))
        for b in self.buckets:
            x = np.zeros((b, s, s, 3), np.uint8)
            jax.block_until_ready(self._predict(self.params, x))
        logger.info(f"Predictor warm for buckets {self.buckets}")

    def predict_proba(self, images_u8: np.ndarray) -> np.ndarray:
        """uint8 [N, S, S, 3] → probabilities [N, num_classes] (numpy).

        Requests larger than the top bucket are processed in top-bucket
        chunks; smaller ones pad up to the nearest bucket.
        """
        t0 = time.perf_counter()
        probs = _bucketed_predict(
            images_u8, self.buckets, self.config.data.image_size,
            lambda chunk: self._predict(self.params, chunk),
        )
        _record_latency(self, (time.perf_counter() - t0) * 1000)
        return probs

    def labels_from_probs(self, probs, threshold: float = 0.5):
        """Disease-name lists per image from probabilities already in hand
        (the HTTP handler uses this to avoid a second device pass)."""
        return [
            [self.disease_names[i] for i in np.nonzero(row > threshold)[0]]
            for row in np.asarray(probs)
        ]

    def predict_labels(self, images_u8, threshold: float = 0.5):
        """Disease-name lists per image at the given threshold."""
        return self.labels_from_probs(
            self.predict_proba(images_u8), threshold
        )

    # ------------------------------------------------------------------

    def latency_stats(self) -> dict:
        return _latency_stats(self)


def export_serving(config: Config, out_dir: str, *,
                   checkpoint_path: str | None = None, params=None,
                   precision: str = "bf16", buckets: tuple = DEFAULT_BUCKETS,
                   tome_r: int = 0, platforms=None,
                   calibration_images=None) -> dict:
    """Write a self-contained serving artifact: serialized StableHLO programs
    (one per batch bucket, via ``jax.export``) + a weights file + manifest.

    The artifact replays WITHOUT this package's model code — deployment
    needs only the jax runtime (:class:`ExportedPredictor`, ~40 lines, or
    any StableHLO consumer). The program is the full serve path (uint8 →
    fused preprocess → model → sigmoid), so the deployed graph is
    byte-identical to what `Predictor` runs; weights stay OUTSIDE the
    program (passed as arguments) so one multi-GB blob isn't re-serialized
    per bucket and checkpoints remain swappable.

    ``platforms``: e.g. ``("tpu", "cpu")`` cross-lowers for serving
    hardware other than the exporting host's (StableHLO is
    platform-checked at load). Default: the current backend.

    ``precision='int8'`` bakes the static-PTQ program: pre-quantised
    weights + activation scales calibrated on ``calibration_images``
    (uint8 [N, S, S, 3]; REQUIRED unless the checkpoint carries
    QAT-trained scales — noise calibration would ship garbage scales in a
    deployment artifact). Returns the manifest dict.
    """
    import os

    from jax import export as jexport

    pred = Predictor(config, checkpoint_path, precision=precision,
                     buckets=buckets, params=params, tome_r=tome_r)
    if precision == "int8" and "quant" not in pred._variables:
        if calibration_images is None:
            raise ValueError(
                "int8 export needs calibration_images (or a QAT "
                "checkpoint whose trained scales ride along)"
            )
        pred.calibrate(np.asarray(calibration_images, np.uint8))
    os.makedirs(out_dir, exist_ok=True)
    s = config.data.image_size
    kw = {"platforms": tuple(platforms)} if platforms else {}
    flat_paths, treedef = jax.tree_util.tree_flatten_with_path(
        pred._variables)

    # int8: the static path reads w_q/w_scale/act_scale — the fp32 'kernel'
    # of every quantised QDense is dead (but must stay in the flax tree for
    # shape validation). Bake dead kernels as closed-over constants: XLA
    # never references them, so neither the program nor the npz ships the
    # ~4x redundant fp32 copies.
    def quantized_prefixes(node, prefix=()):
        out = set()
        for key, val in node.items():
            if key == "w_q":
                out.add(prefix)
            elif isinstance(val, dict):
                out |= quantized_prefixes(val, prefix + (key,))
        return out

    qprefixes = (quantized_prefixes(pred._variables["quant"])
                 if "quant" in pred._variables else set())

    def is_dead(path):
        keys = tuple(getattr(k, "key", k) for k in path)
        return (keys[0] == "params" and keys[-1] == "kernel"
                and keys[1:-1] in qprefixes)

    flat = [leaf for _, leaf in flat_paths]
    dead = {i for i, (path, _) in enumerate(flat_paths) if is_dead(path)}
    live_idx = [i for i in range(len(flat)) if i not in dead]

    # flat-leaf signature: the artifact consumer never needs the pytree
    # structure (treedefs don't serialize portably) — weights are positional
    @jax.jit
    def flat_fn(*args):
        *live, images = args
        it = iter(live)
        leaves = [flat[i] if i in dead else next(it)
                  for i in range(len(flat))]
        return pred._predict_fn(jax.tree.unflatten(treedef, leaves), images)

    w_structs = [jax.ShapeDtypeStruct(flat[i].shape, flat[i].dtype)
                 for i in live_idx]
    for b in pred.buckets:
        exp = jexport.export(flat_fn, **kw)(
            *w_structs, jax.ShapeDtypeStruct((b, s, s, 3), jnp.uint8)
        )
        with open(os.path.join(out_dir, f"predict_b{b}.shlo"), "wb") as f:
            f.write(exp.serialize())
    live = [flat[i] for i in live_idx]
    np.savez(os.path.join(out_dir, "weights.npz"),
             **{str(i): np.asarray(v) for i, v in enumerate(live)})
    # np.load round-trips extension dtypes (bf16) as void — record the true
    # leaf dtypes so the loader can view them back
    leaf_dtypes = [str(np.asarray(v).dtype) for v in live]
    import json as _json

    manifest = {
        "format": "gavit_tpu.serving_export.v1",
        "model": config.model.name,
        "image_size": s,
        "num_classes": config.model.num_classes,
        "disease_names": list(pred.disease_names),
        "buckets": list(pred.buckets),
        "precision": precision,
        "tome_r": tome_r,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "jax_version": jax.__version__,
        "treedef": str(treedef),
        "n_weights": len(live),
        "leaf_dtypes": leaf_dtypes,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        _json.dump(manifest, f, indent=2)
    return manifest


class ExportedPredictor:
    """Serve from an :func:`export_serving` artifact — no model code.

    Loads the per-bucket StableHLO programs + weights and exposes the same
    ``predict_proba`` contract as :class:`Predictor` (pad to bucket, chunk
    past the top bucket). Programs take the weights as positional flat
    leaves (the npz's integer keys, in order) followed by the uint8 batch.
    """

    def __init__(self, artifact_dir: str):
        import json as _json
        import os

        from jax import export as jexport

        with open(os.path.join(artifact_dir, "manifest.json")) as f:
            self.manifest = _json.load(f)
        self.image_size = self.manifest["image_size"]
        self.buckets = tuple(self.manifest["buckets"])
        self.disease_names = self.manifest["disease_names"]
        z = np.load(os.path.join(artifact_dir, "weights.npz"))
        dtypes = self.manifest.get("leaf_dtypes")
        self._weights = []
        for i in range(self.manifest["n_weights"]):
            arr = z[str(i)]
            if dtypes and arr.dtype.str != np.dtype(dtypes[i]).str:
                # extension dtypes (bf16) load back as void — re-view
                arr = arr.view(np.dtype(dtypes[i]))
            self._weights.append(jax.device_put(arr))
        self._fns = {}
        for b in self.buckets:
            with open(os.path.join(artifact_dir, f"predict_b{b}.shlo"),
                      "rb") as f:
                self._fns[b] = jexport.deserialize(f.read())
        self._latencies_ms = _latency_window()
        self._latency_count = 0
        import threading

        self._stats_lock = threading.Lock()

    latency_stats = Predictor.latency_stats
    labels_from_probs = Predictor.labels_from_probs  # needs disease_names only

    def warmup(self):
        """XLA still compiles each deserialized program on first call —
        pre-compile every bucket so the first request doesn't stall."""
        s = self.image_size
        for b in self.buckets:
            np.asarray(self._fns[b].call(
                *self._weights, jnp.zeros((b, s, s, 3), jnp.uint8)))
        logger.info(f"ExportedPredictor warm for buckets {self.buckets}")

    def predict_proba(self, images_u8: np.ndarray) -> np.ndarray:
        t0 = time.perf_counter()
        probs = _bucketed_predict(
            images_u8, self.buckets, self.image_size,
            lambda chunk: self._fns[chunk.shape[0]].call(
                *self._weights, jnp.asarray(chunk)),
        )
        _record_latency(self, (time.perf_counter() - t0) * 1000)
        return probs


class QueueFull(RuntimeError):
    """Backpressure signal: the micro-batcher's pending-row bound is
    exceeded. The serving layer maps this to HTTP 503 + Retry-After so an
    overloaded replica sheds load at admission instead of growing an
    unbounded queue of threads all blocked in ``submit``."""


class MicroBatcher:
    """Cross-request micro-batching for online serving.

    Concurrent requests each paying their own bucket-1 device call serialize
    on the chip; coalescing them into one bucket-N call serves N requests for
    ~one call's latency (the per-call cost is dispatch + HBM weight streaming,
    nearly flat in the batch until the MXU saturates — BASELINE.md's b64
    sweet spot). A worker thread drains a queue: a flush fires when the
    accumulated rows reach the predictor's top bucket or the oldest request
    has waited ``max_wait_ms`` (the latency budget a request donates to ride
    a bigger batch; 0 still coalesces whatever arrived while the device was
    busy — queue-depth batching with no added wait).

    ``submit`` blocks the calling thread (e.g. an HTTP handler) until its
    rows come back; a flush-wide failure propagates to exactly the waiters
    of that flush. stdlib-threading only — no external queue service.
    """

    def __init__(self, predictor: Predictor, *, max_wait_ms: float = 2.0,
                 max_batch: int | None = None,
                 max_queue_rows: int | None = None):
        import queue
        import threading

        self.predictor = predictor
        self.max_wait = max_wait_ms / 1000.0
        self.max_batch = max_batch or predictor.buckets[-1]
        # admission bound: pending = queued + in-flight rows. Default 8
        # full flushes of lag — past that a request would wait ≥8 device
        # calls anyway, so telling the client to retry (503) beats holding
        # its handler thread. None/0 disables (pre-r4 behavior).
        self.max_queue_rows = (max_queue_rows if max_queue_rows is not None
                               else 8 * self.max_batch)
        self._pending_rows = 0
        self._rejected = 0
        self.image_size = (getattr(predictor, "image_size", None)
                           or predictor.config.data.image_size)
        self._q: queue.Queue = queue.Queue()
        self._batch_sizes = _latency_window()
        self._total_flushes = 0
        self._total_rows = 0
        self._stats_lock = threading.Lock()
        self._closed = False
        self._close_join_s = 5.0  # bounded first join in close()
        # serialises the closed-check+enqueue in submit() against close():
        # without it a submit could pass the check, get descheduled while
        # close() drains, then enqueue into a queue nobody reads — hanging
        # the caller on done.wait() forever
        self._submit_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="microbatcher")
        self._worker.start()

    # each queue item: (images [n, S, S, 3], event, result-slot list)

    def submit(self, images_u8: np.ndarray) -> np.ndarray:
        import threading

        # validate HERE so a malformed request fails only its own caller —
        # inside the flush it would poison every coalesced waiter
        images_u8 = validate_images(images_u8, self.image_size)
        done = threading.Event()
        slot: list = [None]
        n = images_u8.shape[0]
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("MicroBatcher is closed")
            # pending > 0: a request larger than the bound itself must not
            # be rejected while the batcher is idle — it would 503 forever
            # (Retry-After on a permanently-unservable request); oversized
            # requests are admitted alone and chunked by the predictor
            if self.max_queue_rows and self._pending_rows > 0 and \
                    self._pending_rows + n > self.max_queue_rows:
                self._rejected += 1
                raise QueueFull(
                    f"{self._pending_rows} rows pending (bound "
                    f"{self.max_queue_rows}); retry later"
                )
            self._pending_rows += n
            self._q.put((images_u8, done, slot))
        done.wait()
        if isinstance(slot[0], Exception):
            raise slot[0]
        return slot[0]

    def _run(self):
        import queue
        import time as _time

        # loop until the None sentinel: close() guarantees every accepted
        # submit is FIFO-ahead of it, so draining to the sentinel (rather
        # than polling _closed, which a max-batch flush could observe before
        # the queue is empty) flushes every accepted request exactly once
        while True:
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                # NOT a termination signal even when _closed is set: a
                # submit racing close() can enqueue between this timeout
                # and the _closed read — returning here would error-drain
                # that accepted request.  close() always enqueues the
                # sentinel, so looping to it is both live and exact.
                continue
            if first is None:
                return
            batch = [first]
            rows = first[0].shape[0]
            done = False
            deadline = _time.monotonic() + self.max_wait
            while rows < self.max_batch:
                timeout = deadline - _time.monotonic()
                try:
                    item = self._q.get(timeout=max(timeout, 0.0))
                except queue.Empty:
                    break
                if item is None:
                    done = True
                    break
                batch.append(item)
                rows += item[0].shape[0]
            self._flush(batch)
            if done:
                return

    def _flush(self, batch):
        rows = sum(b[0].shape[0] for b in batch)
        with self._stats_lock:
            self._batch_sizes.append(rows)
            self._total_flushes += 1
            self._total_rows += rows
        try:
            try:
                probs = self.predictor.predict_proba(
                    np.concatenate([b[0] for b in batch])
                )
            except Exception as e:  # propagate to this flush's waiters only
                for _, done, slot in batch:
                    slot[0] = e
                    done.set()
                return
            off = 0
            for imgs, done, slot in batch:
                n = imgs.shape[0]
                slot[0] = probs[off : off + n]
                off += n
                done.set()
        finally:
            # pending = queued + in-flight: release admission capacity only
            # once the device call for these rows is over (either way)
            with self._submit_lock:
                self._pending_rows -= rows

    def stats(self) -> dict:
        # snapshot under the lock — same deque-mutated-during-iteration
        # hazard as _latency_stats (a /stats scrape racing a worker flush)
        with self._submit_lock:
            pending, rejected = self._pending_rows, self._rejected
        with self._stats_lock:
            if not self._batch_sizes:
                return {"flushes": 0, "pending_rows": int(pending),
                        "rejected": int(rejected)}
            arr = np.asarray(self._batch_sizes)
            flushes, rows = self._total_flushes, self._total_rows
        # flushes/rows are lifetime totals; the shape stats (mean/max/
        # coalesced) come from the bounded sliding window
        return {
            "flushes": int(flushes),
            "rows": int(rows),
            "mean_batch": float(arr.mean()),
            "max_batch": int(arr.max()),
            "coalesced_frac": float((arr > 1).mean()),
            "pending_rows": int(pending),
            "rejected": int(rejected),
        }

    def close(self):
        import queue

        with self._submit_lock:
            # under the lock: every submit enqueued before this point is
            # FIFO-ahead of the None sentinel (the worker flushes it), and
            # every submit after it sees _closed and raises
            self._closed = True
            self._q.put(None)
        self._worker.join(timeout=self._close_join_s)
        if self._worker.is_alive():
            # a slow in-flight flush (one device call can exceed the bounded
            # join, e.g. a cold-bucket compile): the worker is guaranteed to
            # reach the sentinel, so wait it out — error-draining here would
            # break the flush-every-accepted-request guarantee
            self._worker.join()
        # the worker is dead: anything still queued can never be flushed —
        # fail it (abnormal worker death; better an error than a hung caller)
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                return
            if item is not None:
                imgs, done, slot = item
                slot[0] = RuntimeError("MicroBatcher closed before flush")
                done.set()
                with self._submit_lock:
                    self._pending_rows -= imgs.shape[0]
