"""Worker for the 2-process multi-host test (tests/test_multihost.py).

Each process gets 4 virtual CPU devices (global mesh: 8), initializes
jax.distributed against a local coordinator, feeds its per-process shard of
the global batch, and runs one training epoch + validation. The parent
asserts both processes report identical globally-gathered metrics.

Usage: python multihost_worker.py <coordinator> <num_processes> <process_id> [tp]

With the optional ``tp`` flag the worker trains on a (data=4, model=2) mesh —
multi-host tensor parallelism, with the 'model' axis spanning process
boundaries — using the XLA attention/graph impls (the Pallas kernels are
GSPMD-opaque).
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=int(sys.argv[2]),
    process_id=int(sys.argv[3]),
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gavit_tpu.config import from_dict  # noqa: E402
from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset  # noqa: E402
from gavit_tpu.models.vit import build_model, init_params  # noqa: E402
from gavit_tpu.training import Trainer  # noqa: E402


def main():
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4
    mode = sys.argv[4] if len(sys.argv) > 4 else ""
    tp = 2 if mode == "tp" else 1
    use_grain = mode == "grain"
    # "ragged": a val set whose per-process shard has a ragged tail batch
    # (18 local rows, batches 8+8+2) — exercises the interleaved wrap-pad
    # masking in Trainer.validate (global rows [p0 real.., p0 pad, p1 ...])
    val_size = 36 if mode == "ragged" else 32

    global_bs = 16
    local_bs = global_bs // jax.process_count()
    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 1, "num_heads": 2,
                  "num_classes": 14},
        "data": {"batch_size": global_bs, "image_size": 16},
        "training": {"epochs": 1, "warmup_epochs": 1, "precision": "fp32",
                     "log_every": 1000},
        "mesh": {"data": 8 // tp, "model": tp},
        "paths": {"save_dir": "/tmp/mh_ckpt", "log_dir": "/tmp/mh_logs"},
    })
    train_ds = SyntheticChestXrayDataset(size=64, image_size=16, seed=0)
    val_ds = SyntheticChestXrayDataset(size=val_size, image_size=16, seed=1)
    if use_grain:
        # the grain tier shards via ShardByJaxProcess; len() must count the
        # PER-PROCESS batches or the Trainer's LR schedule is process_count×
        # too long (round-2 review finding)
        from gavit_tpu.data.grain_pipeline import GrainLoader

        tl = GrainLoader(train_ds, local_bs, shuffle=True, drop_last=True)
        vl = GrainLoader(val_ds, local_bs, shuffle=False)
    else:
        tl = DataLoader(train_ds, local_bs, shuffle=True, num_workers=1,
                        drop_last=True, shard_by_process=True)
        vl = DataLoader(val_ds, local_bs, shuffle=False, num_workers=1,
                        shard_by_process=True)
    assert len(tl) == 64 // jax.process_count() // local_bs, len(tl)

    # default impls even under TP: the head-partitioned Pallas attention
    # (parallel/op_sharding.py) must work with the 'model' axis spanning
    # process boundaries (the Trainer traces under jax.set_mesh; the
    # fused-MLP kernel alone falls back to XLA, enforced by the Trainer)
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    trainer = Trainer(model, params, tl, vl, cfg)
    if tp > 1:
        qkv = trainer.state.params["model"]["blocks_0"]["attn"]["qkv"]["kernel"]
        assert "model" in str(qkv.sharding.spec), qkv.sharding

    # validation on the INITIAL params: directly comparable to a
    # single-process run (training batches group differently under
    # per-process sharding, so post-training metrics are not)
    val0 = trainer.validate()
    train_metrics = trainer.train_epoch()
    val_metrics = trainer.validate()
    print("RESULT " + json.dumps({
        "mode": mode,
        "tp": tp,
        "process": jax.process_index(),
        "step": int(trainer.state.step),
        "train_loss": round(float(train_metrics["loss"]), 6),
        "train_auc": round(float(train_metrics["mean_auc"]), 6),
        "val_loss": round(float(val_metrics["loss"]), 6),
        "val_auc": round(float(val_metrics["mean_auc"]), 6),
        "val0_loss": round(float(val0["loss"]), 6),
        "val0_auc": round(float(val0["mean_auc"]), 6),
    }), flush=True)


if __name__ == "__main__":
    main()
