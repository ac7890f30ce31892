"""Multi-host data parallelism: a REAL 2-process jax.distributed cluster on
CPU (4 virtual devices per process = the same 8-device mesh the rest of the
suite uses), each process feeding its per-process shard of the global batch
(SURVEY.md §2.6 / §5 distributed-comm rows).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_data_parallel_training():
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count (4)
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
             coordinator, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(REPO),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"

    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-2000:]
        results.append(json.loads(lines[-1][len("RESULT "):]))

    a, b = results
    assert {a["process"], b["process"]} == {0, 1}
    # SPMD: both processes executed the same global program and gathered the
    # same global predictions — metrics must be identical
    for key in ("step", "train_loss", "train_auc", "val_loss", "val_auc"):
        assert a[key] == b[key], (key, a, b)
    assert a["step"] == 4  # 64 samples / 16 global batch
    assert np.isfinite(a["train_loss"]) and np.isfinite(a["val_loss"])


def test_shard_by_process_single_process_is_identity():
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset

    ds = SyntheticChestXrayDataset(size=32, image_size=8, seed=0)
    plain = DataLoader(ds, 8, shuffle=True, num_workers=1, seed=5)
    sharded = DataLoader(ds, 8, shuffle=True, num_workers=1, seed=5,
                         shard_by_process=True)
    assert len(plain) == len(sharded)
    for (ia, la), (ib, lb) in zip(plain, sharded):
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(la, lb)


def test_two_process_tensor_parallel_training():
    """Multi-host dp×tp: the 'model' axis spans process boundaries; both
    processes must agree on globally-gathered metrics and the params must
    actually live TP-sharded."""
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
             coordinator, "2", str(i), "tp"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(REPO),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-2000:]
        results.append(json.loads(lines[-1][len("RESULT "):]))
    a, b = results
    assert a["tp"] == b["tp"] == 2
    for key in ("step", "train_loss", "train_auc", "val_loss", "val_auc"):
        assert a[key] == b[key], (key, a, b)
    assert np.isfinite(a["train_loss"])


def test_two_process_ragged_val_matches_single_process():
    """The interleaved wrap-pad masking fix, end-to-end: 2-process validation
    over a val set with ragged per-process tail batches must produce the
    SAME metrics as a single-process run over the same data (per-sample
    accounting is order-independent; with the old prefix-slice accounting,
    process 0's pad duplicates were counted and process 1's tail dropped)."""
    import jax

    from gavit_tpu.config import from_dict
    from gavit_tpu.data import DataLoader, SyntheticChestXrayDataset
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.training import Trainer

    # single-process reference over the same 36-sample val set (ragged tail
    # on the 8-device mesh too: 36 % 16 = 4-row tail padded to 8)
    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 1, "num_heads": 2,
                  "num_classes": 14},
        "data": {"batch_size": 16, "image_size": 16},
        "training": {"epochs": 1, "warmup_epochs": 1, "precision": "fp32",
                     "log_every": 1000},
        "paths": {"save_dir": "/tmp/mh_ref_ck", "log_dir": "/tmp/mh_ref_lg"},
    })
    model = build_model(cfg.model, precision="fp32")
    params = init_params(model, jax.random.key(0))
    train_ds = SyntheticChestXrayDataset(size=64, image_size=16, seed=0)
    val_ds = SyntheticChestXrayDataset(size=36, image_size=16, seed=1)
    tl = DataLoader(train_ds, 16, shuffle=True, num_workers=1, drop_last=True)
    vl = DataLoader(val_ds, 16, shuffle=False, num_workers=1)
    ref = Trainer(model, params, tl, vl, cfg).validate()

    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
             coordinator, "2", str(i), "ragged"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(REPO),
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-2000:]
        results.append(json.loads(lines[-1][len("RESULT "):]))
    a, b = results
    assert a["val_loss"] == b["val_loss"]
    assert a["val_auc"] == b["val_auc"]
    # initial-params metrics over exactly the 36 genuine samples — matches
    # the single-process run (order-independent per-sample accounting;
    # post-training metrics are not comparable because per-process sharding
    # groups the training batches differently)
    np.testing.assert_allclose(a["val0_loss"], ref["loss"], atol=2e-5)
    np.testing.assert_allclose(a["val0_auc"], ref["mean_auc"], atol=2e-5)


def _run_cluster(nproc, ndev, data_ax, model_ax, savedir, mode, timeout=600):
    """Launch the round-3 cluster worker on nproc processes; return the
    parsed RESULT dicts."""
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable,
             str(REPO / "tests" / "multihost_cluster_worker.py"),
             coordinator, str(nproc), str(i), str(ndev),
             str(data_ax), str(model_ax), str(savedir), mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(REPO),
        )
        for i in range(nproc)
    ]
    outs = [p.communicate(timeout=timeout)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-2000:]
        results.append(json.loads(lines[-1][len("RESULT "):]))
    return results


def _oracle_trainer(tmp_path, val_size=36):
    """Single-process reference trainer over the same data/model as the
    cluster worker (multihost_cluster_worker.py constants)."""
    import jax

    from gavit_tpu.config import from_dict
    from gavit_tpu.data.grain_pipeline import GrainLoader
    from gavit_tpu.data import SyntheticChestXrayDataset
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.training import Trainer

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 1, "num_heads": 2,
                  "num_classes": 14},
        "data": {"batch_size": 16, "image_size": 16},
        "training": {"epochs": 1, "warmup_epochs": 1, "precision": "fp32",
                     "log_every": 1000},
        "mesh": {"data": 1, "model": 1},
        "paths": {"save_dir": str(tmp_path / "oracle_ck"),
                  "log_dir": str(tmp_path / "oracle_lg")},
    })
    train_ds = SyntheticChestXrayDataset(size=64, image_size=16, seed=0)
    val_ds = SyntheticChestXrayDataset(size=val_size, image_size=16, seed=1)
    tl = GrainLoader(train_ds, 16, shuffle=True, drop_last=True,
                     shard=(0, 1), seed=13)
    vl = GrainLoader(val_ds, 16, shuffle=False, shard=(0, 1))
    model = build_model(cfg.model, precision="fp32",
                        attn_impl="xla", graph_impl="xla")
    params = init_params(model, jax.random.key(0))
    return Trainer(model, params, tl, vl, cfg)


def test_four_process_tp_grain_ragged_mid_epoch_resume(tmp_path):
    """The pc=4 combination test (round-2 verdict #6 + #2): a real 4-process
    cluster on a dp×tp (8×2) mesh with grain-sharded input streams, ragged
    per-stream val tails (interleaved wrap-pad mask tiled 4×), a mid-epoch
    preemption checkpoint with PER-PROCESS loader-state sidecars, and a
    fresh-trainer resume. Each process must consume exactly its unseen
    shard; val metrics must match a single-process oracle."""
    results = _run_cluster(4, 4, 8, 2, tmp_path / "ck", "resume")
    assert {r["process"] for r in results} == {0, 1, 2, 3}
    assert all(r["num_shards"] == 4 for r in results)
    assert {r["shard_index"] for r in results} == {0, 1, 2, 3}

    all_ids = []
    for r in results:
        a, b = set(r["ids_a"]), set(r["ids_b"])
        # resume consumed exactly this process's unseen samples
        assert a.isdisjoint(b), (sorted(a & b), r["process"])
        assert len(a) + len(b) == 64 // 4, (len(a), len(b))
        assert len(b) > 0  # the preemption really was mid-epoch
        all_ids.extend(r["ids_a"] + r["ids_b"])
    # the four streams together cover the epoch exactly once
    assert sorted(all_ids) == list(range(64))

    a = results[0]
    for r in results[1:]:
        for key in ("step", "val0_loss", "val0_auc", "val_loss", "val_auc"):
            assert a[key] == r[key], (key, a, r)
    assert a["step"] == 4  # 64 samples / 16 global batch

    # ragged-tail accounting at pc=4 == single-process oracle (initial
    # params: directly comparable)
    ref = _oracle_trainer(tmp_path).validate()
    np.testing.assert_allclose(a["val0_loss"], ref["loss"], atol=2e-5)
    np.testing.assert_allclose(a["val0_auc"], ref["mean_auc"], atol=2e-5)


def test_two_process_pure_tp_shared_feeding_matches_single(tmp_path):
    """Pure cross-host tensor parallelism (mesh data=1, model=2 over two
    single-device hosts): data_feed_spec puts both processes in ONE feeding
    group, so both feed the identical full batch — and the training result
    must equal a single-device run on the same stream."""
    results = _run_cluster(2, 1, 1, 2, tmp_path / "ck", "xtp")
    a, b = results
    assert a["num_shards"] == b["num_shards"] == 1
    assert a["shard_index"] == b["shard_index"] == 0
    for key in ("step", "train_loss", "val0_loss", "val_loss"):
        assert a[key] == b[key], (key, a, b)
    assert a["step"] == 4

    oracle = _oracle_trainer(tmp_path)
    ref0 = oracle.validate()
    ref_tm = oracle.train_epoch()
    ref_val = oracle.validate()
    np.testing.assert_allclose(a["val0_loss"], ref0["loss"], atol=5e-5)
    np.testing.assert_allclose(a["train_loss"], ref_tm["loss"], atol=5e-5)
    np.testing.assert_allclose(a["val_loss"], ref_val["loss"], atol=5e-5)
    np.testing.assert_allclose(a["val_auc"], ref_val["mean_auc"], atol=1e-3)


def test_two_process_pure_tp_sp_matches_single(tmp_path):
    """Cross-host TP + sequence parallelism (mesh.sp): the residual stream
    is token-sharded over a 'model' axis that CROSSES hosts, and the
    training result still equals a single-device run on the same stream."""
    results = _run_cluster(2, 1, 1, 2, tmp_path / "ck", "xtp_sp")
    a, b = results
    for key in ("step", "train_loss", "val0_loss", "val_loss"):
        assert a[key] == b[key], (key, a, b)

    oracle = _oracle_trainer(tmp_path)
    ref0 = oracle.validate()
    ref_tm = oracle.train_epoch()
    ref_val = oracle.validate()
    np.testing.assert_allclose(a["val0_loss"], ref0["loss"], atol=5e-5)
    np.testing.assert_allclose(a["train_loss"], ref_tm["loss"], atol=5e-5)
    np.testing.assert_allclose(a["val_loss"], ref_val["loss"], atol=5e-5)


def test_two_process_grain_loader_training():
    """The grain tier in a real 2-process cluster: per-process ShardByJaxProcess
    feeding, per-process len() (LR-schedule correctness), identical global
    metrics on both hosts."""
    coordinator = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
             coordinator, "2", str(i), "grain"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=str(REPO),
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-2000:]
        results.append(json.loads(lines[-1][len("RESULT "):]))
    a, b = results
    # 64 samples / 2 processes / 8 local batch = 4 steps — NOT 8 (the
    # global-len bug this guards against)
    assert a["step"] == 4, a
    for key in ("step", "train_loss", "val_loss"):
        assert a[key] == b[key], (key, a, b)


def test_two_process_grouped_moe_ep_matches_single(tmp_path):
    """r4: the grouped (dropless) MoE engine expert-parallel across REAL
    process boundaries — mesh data=1, model=2 over two single-device
    hosts, expert bank sharded host-to-host, the psum combine riding the
    cross-process collective path. Training result equals a
    single-process run on the same stream."""
    import jax

    from gavit_tpu.config import from_dict
    from gavit_tpu.data import SyntheticChestXrayDataset
    from gavit_tpu.data.grain_pipeline import GrainLoader
    from gavit_tpu.models.vit import build_model, init_params
    from gavit_tpu.training import Trainer

    results = _run_cluster(2, 1, 1, 2, tmp_path / "ck", "moe_ep")
    a, b = results
    assert a["num_shards"] == b["num_shards"] == 1
    for key in ("step", "train_loss", "val0_loss", "val_loss"):
        assert a[key] == b[key], (key, a, b)
    assert a["step"] == 4

    cfg = from_dict({
        "model": {"name": "custom", "img_size": 16, "patch_size": 8,
                  "embed_dim": 32, "depth": 2, "num_heads": 2,
                  "num_classes": 14,
                  "moe": {"enabled": True, "num_experts": 4, "k": 2,
                          "every": 2, "impl": "grouped"}},
        "data": {"batch_size": 16, "image_size": 16},
        "training": {"epochs": 1, "warmup_epochs": 1, "precision": "fp32",
                     "log_every": 1000},
        "mesh": {"data": 1, "model": 1},
        "paths": {"save_dir": str(tmp_path / "oracle_ck"),
                  "log_dir": str(tmp_path / "oracle_lg")},
    })
    train_ds = SyntheticChestXrayDataset(size=64, image_size=16, seed=0)
    val_ds = SyntheticChestXrayDataset(size=36, image_size=16, seed=1)
    tl = GrainLoader(train_ds, 16, shuffle=True, drop_last=True,
                     shard=(0, 1), seed=13)
    vl = GrainLoader(val_ds, 16, shuffle=False, shard=(0, 1))
    model = build_model(cfg.model, precision="fp32",
                        attn_impl="xla", graph_impl="xla")
    params = init_params(model, jax.random.key(0))
    oracle = Trainer(model, params, tl, vl, cfg)
    ref0 = oracle.validate()
    ref_tm = oracle.train_epoch()
    ref_val = oracle.validate()
    np.testing.assert_allclose(a["val0_loss"], ref0["loss"], atol=5e-5)
    np.testing.assert_allclose(a["train_loss"], ref_tm["loss"], atol=5e-5)
    np.testing.assert_allclose(a["val_loss"], ref_val["loss"], atol=5e-5)
