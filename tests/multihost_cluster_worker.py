"""Worker for the round-3 multi-process cluster tests (tests/test_multihost.py).

Scenarios (``mode`` argument):

* ``resume`` — grain loaders on a dp(×tp) mesh; validate on initial params
  (ragged per-stream val tails → exercises the wrap-pad interleave mask at
  this process count), train until a stub preemption fires mid-epoch, save
  the mid-epoch checkpoint (per-process loader-state sidecars), then build a
  FRESH trainer, restore, and finish the epoch. Reports the sample ids
  actually trained in each phase (read back from this process's addressable
  shards of the on-device batch) so the parent can assert each process
  consumed exactly its unseen shard.

* ``xtp`` — pure cross-host tensor parallelism (mesh data=1): every process
  is in ONE feeding group (``data_feed_spec``) and must feed the identical
  full batch. Trains an epoch and validates; the parent compares against a
  single-process oracle, proving the shared-feeding-group path end-to-end.

* ``moe_ep`` (r4) — grouped-engine MoE under dp×ep across REAL processes:
  the dropless engine's shard_map over ('data','model') runs with the
  expert bank sharded across process boundaries (no all-to-all — psum
  combine over ICI/DCN). Validates on initial params (parent compares to a
  single-process oracle), trains an epoch, validates again.

Usage: multihost_cluster_worker.py <coordinator> <nproc> <pid> <ndev>
       <data> <model> <savedir> <mode>
"""

import json
import os
import sys

coordinator = sys.argv[1]
nproc, pid, ndev = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
data_ax, model_ax = int(sys.argv[5]), int(sys.argv[6])
savedir, mode = sys.argv[7], sys.argv[8]

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={ndev}"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=nproc, process_id=pid
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from gavit_tpu.config import from_dict  # noqa: E402
from gavit_tpu.data import SyntheticChestXrayDataset  # noqa: E402
from gavit_tpu.data.grain_pipeline import GrainLoader  # noqa: E402
from gavit_tpu.models.vit import build_model, init_params  # noqa: E402
from gavit_tpu.parallel.mesh import data_feed_spec, make_mesh  # noqa: E402
from gavit_tpu.training import Trainer  # noqa: E402
from gavit_tpu.utils import checkpoint as ckpt_lib  # noqa: E402

GLOBAL_BS = 16
TRAIN_SIZE = 64
VAL_SIZE = 36


class _PreemptAfterSteps:
    def __init__(self, n):
        self.n = n
        self.count = 0

    @property
    def preempted(self):
        self.count += 1
        return self.count > self.n

    def install(self):
        return self

    def uninstall(self):
        pass


def build_trainer(cfg, mesh, shard, record_ids=None, id_of=None):
    train_ds = SyntheticChestXrayDataset(size=TRAIN_SIZE, image_size=16, seed=0)
    val_ds = SyntheticChestXrayDataset(size=VAL_SIZE, image_size=16, seed=1)
    local_bs = GLOBAL_BS // shard[1]
    tl = GrainLoader(train_ds, local_bs, shuffle=True, drop_last=True,
                     shard=shard, seed=13)
    vl = GrainLoader(val_ds, local_bs, shuffle=False, shard=shard)
    model = build_model(cfg.model, precision="fp32",
                        attn_impl="xla", graph_impl="xla")
    params = init_params(model, jax.random.key(0))
    trainer = Trainer(model, params, tl, vl, cfg, mesh=mesh)
    if record_ids is not None:
        orig = trainer._train_step

        def recording_step(state, rng, images, labels):
            for sh in images.addressable_shards:
                for row in np.asarray(sh.data):
                    record_ids.add(id_of[row.tobytes()])
            return orig(state, rng, images, labels)

        trainer._train_step = recording_step
    return trainer


def main():
    assert jax.device_count() == nproc * ndev, jax.device_count()
    assert jax.local_device_count() == ndev
    model_cfg = {"name": "custom", "img_size": 16, "patch_size": 8,
                 "embed_dim": 32, "depth": 1, "num_heads": 2,
                 "num_classes": 14}
    if mode == "moe_ep":
        model_cfg.update({
            "depth": 2,
            "moe": {"enabled": True, "num_experts": 4, "k": 2,
                    "every": 2, "impl": "grouped"},
        })
    cfg = from_dict({
        "model": model_cfg,
        "data": {"batch_size": GLOBAL_BS, "image_size": 16},
        "training": {"epochs": 1, "warmup_epochs": 1, "precision": "fp32",
                     "log_every": 1000},
        "mesh": {"data": data_ax, "model": model_ax,
                 "sp": mode == "xtp_sp"},
        "paths": {"save_dir": savedir, "log_dir": os.path.join(savedir, "lg")},
    })
    mesh = make_mesh(cfg.mesh)
    shard_index, num_shards, _k = data_feed_spec(mesh)
    shard = (shard_index, num_shards)

    result = {"process": pid, "mode": mode,
              "shard_index": shard_index, "num_shards": num_shards}

    if mode in ("xtp", "xtp_sp", "moe_ep"):
        trainer = build_trainer(cfg, mesh, shard)
        if mode == "xtp_sp":
            assert trainer.model.sp, "mesh.sp did not reach the model"
        if mode == "moe_ep":
            # the expert bank must actually live sharded over 'model',
            # whose shards span BOTH processes on this mesh
            bank = (trainer.state.params["model"]["blocks_1"]["moe"]
                    ["fc1_kernel"])
            assert "model" in str(bank.sharding.spec), bank.sharding
        else:
            qkv = (trainer.state.params["model"]["blocks_0"]["attn"]["qkv"]
                   ["kernel"])
            assert "model" in str(qkv.sharding.spec), qkv.sharding
        result["val0"] = trainer.validate()
        tm = trainer.train_epoch()
        result["val"] = trainer.validate()
        result["train_loss"] = round(float(tm["loss"]), 6)
        result["step"] = int(trainer.state.step)
    elif mode == "resume":
        train_ds = SyntheticChestXrayDataset(size=TRAIN_SIZE, image_size=16,
                                             seed=0)
        id_of = {train_ds[i][0].tobytes(): i for i in range(TRAIN_SIZE)}

        seen_a: set = set()
        trainer = build_trainer(cfg, mesh, shard, seen_a, id_of)
        if model_ax > 1:
            qkv = (trainer.state.params["model"]["blocks_0"]["attn"]["qkv"]
                   ["kernel"])
            assert "model" in str(qkv.sharding.spec), qkv.sharding
        result["val0"] = trainer.validate()
        trainer._preemption = _PreemptAfterSteps(2)
        trainer.train()  # preempts mid-epoch, saves the resume checkpoint

        latest = ckpt_lib.latest_checkpoint(savedir)
        assert latest is not None
        seen_b: set = set()
        trainer2 = build_trainer(cfg, mesh, shard, seen_b, id_of)
        trainer2.restore_checkpoint(latest)
        assert trainer2.current_epoch == 0, trainer2.current_epoch
        trainer2.train()
        result["ids_a"] = sorted(seen_a)
        result["ids_b"] = sorted(seen_b)
        result["step"] = int(trainer2.state.step)
        result["val"] = trainer2.val_metrics_history[-1]
    else:
        raise SystemExit(f"unknown mode {mode!r}")

    for key in ("val0", "val"):
        if key in result:
            m = result.pop(key)
            result[f"{key}_loss"] = round(float(m["loss"]), 6)
            result[f"{key}_auc"] = round(float(m["mean_auc"]), 6)
    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
