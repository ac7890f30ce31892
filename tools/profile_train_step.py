"""Op-level profile of the flagship train step on the live backend.

Captures 5 steps with ``jax.profiler`` and aggregates xprof's
``framework_op_stats`` (gviz JSON) into per-step pools: GEMMs by layer,
Pallas kernels by site, and the elementwise/reduction remainder. This is the
tool behind the step-cost tables in BASELINE.md.

Usage (TPU, detached — see CLAUDE.md on the axon tunnel):
    JAX_PLATFORMS='' nohup python tools/profile_train_step.py > prof.log 2>&1 &
"""
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import gavit_tpu

gavit_tpu.setup_compilation_cache()
from gavit_tpu.config import from_dict
from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
from gavit_tpu.models.vit import build_model, init_params
from gavit_tpu.parallel.mesh import make_mesh, shard_batch
from gavit_tpu.training import Trainer

STEPS = 5


def build(model_name="vit_base_16", img=224, bs=128, adjacency="knn",
          moe_impl=""):
    model = {"name": model_name, "img_size": img, "patch_size": 16,
             "num_classes": 14, "drop_rate": 0.1,
             "graph": {"enabled": True, "num_blocks": 2,
                       "adjacency": adjacency, "k": 8, "dynamic": True}}
    if moe_impl:
        model["moe"] = {"enabled": True, "num_experts": 8, "k": 2,
                        "every": 2, "impl": moe_impl}
    cfg = from_dict({
        "model": model,
        "data": {"batch_size": bs, "image_size": img},
        "training": {"epochs": 10, "warmup_epochs": 1, "precision": "bf16"},
    })
    mesh = make_mesh(cfg.mesh)
    model = build_model(cfg.model, precision="bf16")
    params = init_params(model, jax.random.key(0))
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (bs, img, img, 3), np.uint8)
    labels = (rng.random((bs, 14)) < 0.2).astype(np.float32)
    batch = shard_batch(mesh, (images, labels))
    ds = SyntheticChestXrayDataset(size=bs, image_size=img)
    loader = DataLoader(ds, bs, num_workers=2)
    tr = Trainer(model, params, loader, loader, cfg, mesh=mesh)
    return tr, batch


def capture(tr, batch, logdir):
    state = tr.state
    state, m, _ = tr._train_step(state, tr.base_rng, *batch)
    _ = float(m["loss"])  # sync through the tunnel (block_until_ready lies)
    print("compiled", flush=True)
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(STEPS):
        state, m, _ = tr._train_step(state, tr.base_rng, *batch)
    _ = float(m["loss"])
    jax.profiler.stop_trace()
    print("traced", flush=True)


def op_rows(logdir):
    from xprof.convert import raw_to_tool_data as conv

    xs = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    data, _ = conv.xspace_to_tool_data(xs[-1:], "framework_op_stats", {})
    d = json.loads(data.decode() if isinstance(data, bytes) else data)
    tbl = d[0] if isinstance(d, list) else d
    cols = [c["id"] for c in tbl["cols"]]
    rows = [
        dict(zip(cols, [c["v"] if c else None for c in r["c"]]))
        for r in tbl["rows"]
    ]
    return [
        r for r in rows
        if str(r.get("host_or_device", "")).lower().startswith("d")
    ]


_SITES = (
    ("moe", re.compile(r"moe|gmm|ragged|router|expert|group_")),
    ("attn", re.compile(r"/attn[/_]|fused_qkv|attention")),
    ("dropout", re.compile(r"dropout")),
    ("mlp/fc1", re.compile(r"mlp/fc1|gelu")),
    ("mlp/fc2", re.compile(r"mlp/fc2")),
    ("graph", re.compile(r"graph_\d|top_k|adjacency")),
    ("patch_embed", re.compile(r"patch_embed")),
    ("head/loss", re.compile(r"head|loss|sigmoid|criterion")),
    ("qkv-proj", re.compile(r"qkv|proj")),
    ("optimizer", re.compile(r"adam|optax|update|global_norm")),
    ("preprocess", re.compile(r"preprocess|normali[sz]e")),
)


def site_of(name: str) -> str:
    low = name.lower()
    for label, pat in _SITES:
        if pat.search(low):
            return label
    return "other"


def report(dev):
    tot = sum(float(r["total_self_time"]) for r in dev) / STEPS
    print(f"\ntotal device self time: {tot/1000:.1f} ms/step over {STEPS} steps")
    bycat, bysite = {}, {}
    for r in dev:
        t = float(r["total_self_time"]) / STEPS / 1000  # -> ms/step
        cat = r.get("type", "?")
        bycat[cat] = bycat.get(cat, 0.0) + t
        key = (cat, site_of(str(r.get("operation", ""))))
        bysite[key] = bysite.get(key, 0.0) + t
    print("--- by HLO category ---")
    for cat, t in sorted(bycat.items(), key=lambda kv: -kv[1]):
        print(f"{t:7.2f} ms  {cat}")
    print("--- by (category, site) ---")
    for (cat, site), t in sorted(bysite.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{t:7.2f} ms  {cat:24s} {site}")
    print("--- top ops ---")
    agg = {}
    for r in dev:
        t = float(r["total_self_time"]) / STEPS / 1000
        name = str(r.get("operation", "?"))[:90]
        agg[(r.get("type", "?"), name)] = agg.get((r.get("type", "?"), name), 0.0) + t
    for (cat, name), t in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        rate = ""
        print(f"{t:7.2f} ms  {cat:18s} {name}{rate}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vit_base_16")
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--adjacency", default="knn",
                    help="graph adjacency (the 384px headline config uses "
                         "learned_static)")
    ap.add_argument("--moe", default="",
                    help="profile the MoE family: 'dense' or 'grouped' "
                         "(E=8 k=2 every=2 — the BASELINE.md MoE config)")
    ap.add_argument("--logdir", default="/tmp/gavit_prof")
    args = ap.parse_args()
    print(f"profiling {args.model} img={args.img} b{args.batch} "
          f"adjacency={args.adjacency} moe={args.moe or 'off'}", flush=True)
    tr, batch = build(args.model, args.img, args.batch, args.adjacency,
                      args.moe)
    capture(tr, batch, args.logdir)
    report(op_rows(args.logdir))
