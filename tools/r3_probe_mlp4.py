"""Round-3 probe #4: bisect the probe-3 regression — time the flagship
train step under combos of (out-dropout fold, dx dtype, VMEM limit).
Each combo runs in a fresh subprocess (env vars are read at import/trace
time; in-process module reloads deadlock with jax).

Usage: nohup python tools/r3_probe_mlp4.py >> logs/r3_mlp.log 2>&1 &
"""
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
sys.path.insert(0, %(repo)r)
import jax, numpy as np
import gavit_tpu
gavit_tpu.setup_compilation_cache()
from gavit_tpu.config import from_dict
from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
from gavit_tpu.models.vit import build_model, init_params
from gavit_tpu.parallel.mesh import make_mesh, shard_batch
from gavit_tpu.training import Trainer

img, bs = 224, 128
cfg = from_dict({
    "model": {"name": "vit_base_16", "img_size": img, "patch_size": 16,
              "num_classes": 14, "drop_rate": 0.1,
              "graph": {"enabled": True, "num_blocks": 2,
                        "adjacency": "knn", "k": 8, "dynamic": True}},
    "data": {"batch_size": bs, "image_size": img},
    "training": {"epochs": 10, "warmup_epochs": 1, "precision": "bf16"},
})
mesh = make_mesh(cfg.mesh)
model = build_model(cfg.model, precision="bf16")
params = init_params(model, jax.random.key(0))
rng = np.random.default_rng(0)
images = rng.integers(0, 256, (bs, img, img, 3), np.uint8)
labels = (rng.random((bs, 14)) < 0.2).astype(np.float32)
images, labels = shard_batch(mesh, (images, labels))
ds = SyntheticChestXrayDataset(size=bs, image_size=img)
loader = DataLoader(ds, bs, num_workers=2)
tr = Trainer(model, params, loader, loader, cfg, mesh=mesh)
state = tr.state
import jax.numpy as jnp
t0 = time.perf_counter()
state, m, _ = tr._train_step(state, tr.base_rng, images, labels)
_ = float(m["loss"])
print(f"compile+1st: {time.perf_counter() - t0:.0f}s", flush=True)
best = 1e9
for reps in (20, 20):
    t0 = time.perf_counter()
    for _ in range(reps):
        state, m, _ = tr._train_step(state, tr.base_rng, images, labels)
    _ = float(m["loss"])
    best = min(best, (time.perf_counter() - t0) / reps)
print(f"RESULT {best*1000:.1f} ms/step {bs/best:.0f} img/s", flush=True)
""" % {"repo": REPO}

COMBOS = [
    ("fold0_dxbf16_v16", {"GAVIT_MLP_FOLD_OUT": "0",
                          "GAVIT_MLP_VMEM_MB": "16"}),
    ("fold1_dxbf16_v16_repeat", {"GAVIT_MLP_VMEM_MB": "16"}),
]

if __name__ == "__main__":
    print(f"=== r3 mlp probe4b {time.strftime('%F %T')}", flush=True)
    for tag, extra in COMBOS:
        env = dict(os.environ, JAX_PLATFORMS="")
        for k in ("GAVIT_MLP_FOLD_OUT", "GAVIT_MLP_DX_F32",
                  "GAVIT_MLP_VMEM_MB"):
            env.pop(k, None)
        env.update(extra)
        r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           cwd=REPO, text=True, capture_output=True,
                           timeout=1800)
        out = [l for l in r.stdout.splitlines()
               if "RESULT" in l or "compile" in l]
        print(f"[{tag}] rc={r.returncode} {' | '.join(out)}", flush=True)
        if r.returncode != 0:
            print(r.stderr[-1500:], flush=True)
    print("probe4b done", flush=True)
