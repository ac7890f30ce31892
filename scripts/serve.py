#!/usr/bin/env python
"""Minimal production serving endpoint for the Graph-Augmented ViT.

Stdlib-only HTTP server wrapping :class:`gavit_tpu.serving.Predictor`
(bucketed batching, warmup-compiled shapes, device-resident weights):

    python scripts/serve.py --config <yaml> --checkpoint <ckpt_dir> \
        [--host 127.0.0.1] [--port 8476] [--precision bf16|fp32|int8]

  --precision int8 serves the calibrated static-PTQ path (+32% throughput
  over bf16 on v5e at b64 — BASELINE.md); warmup performs the calibration.

Endpoints:
  GET  /healthz        → {"status": "ok", "model": ...}
  GET  /stats          → serve-lifetime latency percentiles
  POST /predict        → body: PNG/JPEG bytes, or a JSON list-of-lists uint8
                         image [S,S,3] / batch [N,S,S,3]
                         response: {"probabilities": ..., "labels": ...}
"""

from __future__ import annotations

import argparse
import io
import json
import logging
import os
import signal
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

if os.environ.get("GAVIT_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["GAVIT_PLATFORM"])

import numpy as np

import gavit_tpu

gavit_tpu.setup_compilation_cache()

logger = logging.getLogger("serve")


class GavitHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer with a deep accept backlog.

    The stdlib default request_queue_size of 5 resets connections under a
    concurrent-client burst (measured: 7/256 ECONNRESET at 32 closed-loop
    clients in tools/bench_serve.py on the TPU) — exactly the arrival shape
    the micro-batcher exists to absorb.
    """

    request_queue_size = 128


def build_handler(predictor, image_size: int, model_desc: str,
                  batcher=None, max_body_bytes: int = 128 << 20):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict, headers: dict = None):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):
            logger.info("%s " + fmt, self.client_address[0], *args)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok", "model": model_desc,
                                 "image_size": image_size})
            elif self.path == "/stats":
                stats = predictor.latency_stats() or {"count": 0}
                if batcher is not None:
                    stats["microbatch"] = batcher.stats()
                self._send(200, stats)
            elif self.path == "/metrics":
                # Prometheus text exposition of the same counters /stats
                # serves as JSON — the standard scrape surface
                lines = []

                def emit(name, kind, value, help_=""):
                    if help_:
                        lines.append(f"# HELP gavit_{name} {help_}")
                    lines.append(f"# TYPE gavit_{name} {kind}")
                    lines.append(f"gavit_{name} {value}")

                lat = predictor.latency_stats()
                emit("requests_total", "counter", lat.get("count", 0),
                     "predict calls served (lifetime)")
                for q in ("p50", "p95", "p99", "mean"):
                    if f"{q}_ms" in lat:
                        emit(f"latency_{q}_ms", "gauge", lat[f"{q}_ms"],
                             f"{q} request latency over the sliding window")
                if batcher is not None:
                    mb = batcher.stats()
                    emit("microbatch_flushes_total", "counter",
                         mb.get("flushes", 0), "device flushes (lifetime)")
                    emit("microbatch_rows_total", "counter",
                         mb.get("rows", 0), "rows flushed (lifetime)")
                    if "mean_batch" in mb:
                        emit("microbatch_mean_batch", "gauge",
                             mb["mean_batch"])
                        emit("microbatch_coalesced_frac", "gauge",
                             mb["coalesced_frac"])
                    emit("microbatch_pending_rows", "gauge",
                         mb.get("pending_rows", 0),
                         "rows queued + in-flight (backpressure signal)")
                    emit("microbatch_rejected_total", "counter",
                         mb.get("rejected", 0),
                         "submissions shed with 503 at the admission bound")
                body = ("\n".join(lines) + "\n").encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length > max_body_bytes:
                    # refuse before reading: an unbounded read would buffer
                    # an arbitrarily large body in serving-host memory
                    self.close_connection = True
                    self._send(413, {
                        "error": f"request body {length} bytes exceeds "
                                 f"limit {max_body_bytes} (--max-body-mb)"
                    })
                    return
                raw = self.rfile.read(length)
                ctype = self.headers.get("Content-Type", "")
                if ctype.startswith("application/json"):
                    arr = np.asarray(json.loads(raw), np.uint8)
                else:  # image bytes
                    from PIL import Image

                    with Image.open(io.BytesIO(raw)) as img:
                        img = img.convert("RGB")
                        if img.size != (image_size, image_size):
                            img = img.resize((image_size, image_size),
                                             Image.BILINEAR)
                        arr = np.asarray(img, np.uint8)
                if batcher is not None:
                    probs = batcher.submit(arr)
                else:
                    probs = predictor.predict_proba(arr)
                # labels derive from the probs already in hand (a second
                # predict_labels() call would pay a second device pass)
                labels = predictor.labels_from_probs(probs)
                self._send(200, {
                    "probabilities": probs.round(5).tolist(),
                    "labels": labels,
                    "disease_names": predictor.disease_names,
                })
            except Exception as e:  # client-facing error surface
                from gavit_tpu.serving import QueueFull

                if isinstance(e, QueueFull):
                    # shed load at admission: the replica is >max-queue-rows
                    # behind; Retry-After ≈ one drain of the pending queue
                    self._send(503, {"error": str(e)},
                               headers={"Retry-After": "1"})
                    return
                logger.exception("predict failed")
                self._send(400, {"error": str(e)})

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="")
    p.add_argument("--artifact", default="",
                   help="serve from an export_serving artifact directory "
                        "(StableHLO + weights; no model code / --config "
                        "needed)")
    p.add_argument("--checkpoint", default="")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8476)
    p.add_argument("--precision", default="bf16",
                   choices=["bf16", "fp32", "int8"])
    p.add_argument("--no-warmup", action="store_true")
    p.add_argument("--tome-r", type=int, default=0,
                   help="token-merging acceleration: merge the R most "
                        "similar token pairs after every block "
                        "(training-free throughput/accuracy dial; "
                        "composes with --precision int8)")
    p.add_argument("--max-body-mb", type=int, default=128,
                   help="reject request bodies above this size with 413 "
                        "(an unbounded read would buffer arbitrarily large "
                        "bodies in serving-host memory)")
    p.add_argument("--max-queue-rows", type=int, default=None,
                   help="micro-batcher admission bound: reject with 503 + "
                        "Retry-After once queued+in-flight rows exceed this "
                        "(default 8 full batches; 0 disables)")
    p.add_argument("--coalesce-ms", type=float, default=None,
                   metavar="MS",
                   help="micro-batch concurrent requests: a request waits "
                        "up to MS ms to ride a bigger device batch (0 = "
                        "coalesce only what is already queued). Off when "
                        "unset; 2-5 ms is a good online-serving setting")
    p.add_argument("--mesh", action="store_true",
                   help="serve over every visible chip: batches shard "
                        "along 'data' (config mesh.model > 1 additionally "
                        "Megatron-shards the params for over-HBM models)")
    p.add_argument("--set", action="append", default=[],
                   dest="overrides", metavar="KEY=VALUE",
                   help="Override a config value (dotted keys, "
                        "YAML-parsed values)")
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO)
    if bool(args.artifact) == bool(args.config):
        p.error("exactly one of --config or --artifact is required")

    if args.artifact:
        # export_serving artifact: StableHLO programs + weights — no model
        # code. precision/tome_r were baked at export time; reject flags
        # that would otherwise be silently ignored.
        baked = [flag for flag, on in (
            ("--checkpoint", args.checkpoint),
            ("--precision", args.precision != "bf16"),
            ("--tome-r", args.tome_r),
            ("--mesh", args.mesh),
            ("--set", args.overrides),
        ) if on]
        if baked:
            p.error(f"{' '.join(baked)} cannot combine with --artifact "
                    "(those choices are baked into the artifact at export)")
        from gavit_tpu.serving import ExportedPredictor

        predictor = ExportedPredictor(args.artifact)
        if not args.no_warmup:
            predictor.warmup()
        image_size = predictor.image_size
        desc = f"{predictor.manifest['model']} (exported artifact)"
    else:
        from gavit_tpu.config import load_config
        from gavit_tpu.serving import Predictor

        config = load_config(args.config, args.overrides)
        image_size = config.data.image_size
        mesh = None
        if args.mesh:
            from gavit_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(config.mesh)
            logger.info(f"Serving over mesh {dict(mesh.shape)}")
        predictor = Predictor(config, args.checkpoint or None,
                              precision=args.precision, mesh=mesh,
                              tome_r=args.tome_r)
        if not args.no_warmup:
            predictor.warmup()
        desc = (f"{config.model.name}+graph{config.model.graph.num_blocks}"
                if config.model.graph.enabled else config.model.name)

    batcher = None
    if args.coalesce_ms is not None:
        from gavit_tpu.serving import MicroBatcher

        batcher = MicroBatcher(predictor, max_wait_ms=args.coalesce_ms,
                               max_queue_rows=args.max_queue_rows)
        logger.info(f"Micro-batching: wait {args.coalesce_ms} ms, "
                    f"max batch {batcher.max_batch}, "
                    f"admission bound {batcher.max_queue_rows} rows")

    server = GavitHTTPServer(
        (args.host, args.port),
        build_handler(predictor, image_size, desc, batcher,
                      max_body_bytes=args.max_body_mb << 20),
    )
    logger.info(f"Serving {desc} on http://{args.host}:{args.port}")

    # production stop is SIGTERM (kubelet, systemd, Ctrl-C is SIGINT):
    # route both through the same graceful path — stop accepting, then
    # flush every accepted in-flight request via MicroBatcher.close()
    def _term(_sig, _frm):
        raise KeyboardInterrupt

    signal.signal(signal.SIGTERM, _term)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        logger.info("shutting down")
        server.shutdown()
        if batcher is not None:
            batcher.close()  # flushes every accepted request
        server.server_close()
        logger.info("shutdown complete")


if __name__ == "__main__":
    main()
