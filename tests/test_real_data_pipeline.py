"""The full real-data code path end-to-end WITHOUT real data (round-2
verdict #4): a generated on-disk PNG corpus in the reference label-file
format → ChestXrayDataset → scripts/prepare_dataset.py → packed memmap →
scripts/train.py CLI → scripts/evaluate.py CLI, as one chain through the
real subprocess entry points. De-risks the only previously-unit-tested seam
(file IO → pack → CLI) so a real ChestX-ray14 drop is a config change."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
from PIL import Image

REPO = Path(__file__).resolve().parent.parent


def _make_corpus(root: Path, n: int, size: int = 40, seed: int = 0):
    """PNG files + space-delimited label file (reference
    ``dataset.py:39-41`` contract: filename then 14 float labels)."""
    img_dir = root / "images"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(seed)
    labels = (rng.random((n, 14)) < 0.25).astype(np.float32)
    labels[: n // 2, 0] = 1.0  # every class two-valued where AUC needs it
    labels[n // 2:, 0] = 0.0
    lines = []
    for i in range(n):
        name = f"img_{i:05d}.png"
        arr = rng.integers(0, 256, (size, size), np.uint8)  # grayscale, like NIH
        Image.fromarray(arr, mode="L").save(img_dir / name)
        lines.append(name + " " + " ".join(f"{v:.0f}" for v in labels[i]))
    label_file = root / "train_list.txt"
    label_file.write_text("\n".join(lines) + "\n")
    return img_dir, label_file, labels


def _run(cmd, timeout=420):
    env = dict(os.environ, GAVIT_PLATFORM="cpu")
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable] + cmd, cwd=str(REPO), env=env, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    assert r.returncode == 0, f"{cmd[0]} failed:\n{r.stdout[-4000:]}"
    return r.stdout


def test_png_corpus_to_packed_to_train_to_evaluate(tmp_path):
    img_dir, label_file, labels = _make_corpus(tmp_path, n=48, size=40)

    # 1. the raw-PNG dataset reads the corpus (decode + resize path)
    from gavit_tpu.data.dataset import ChestXrayDataset, PackedChestXrayDataset

    raw = ChestXrayDataset(str(img_dir), str(label_file), image_size=32)
    assert len(raw) == 48
    img0, lab0 = raw[0]
    assert img0.shape == (32, 32, 3) and img0.dtype == np.uint8
    np.testing.assert_array_equal(lab0, labels[0])

    # 2. pack via the CLI
    packed_dir = tmp_path / "packed"
    _run(["scripts/prepare_dataset.py", "--image-dir", str(img_dir),
          "--labels", str(label_file), "--out", str(packed_dir),
          "--image-size", "32", "--workers", "2"])
    packed = PackedChestXrayDataset(str(packed_dir))
    assert len(packed) == 48
    # packed == decoded, pixel-for-pixel, same labels and class weights
    for i in (0, 7, 47):
        np.testing.assert_array_equal(packed[i][0], raw[i][0])
        np.testing.assert_array_equal(packed[i][1], raw[i][1])
    np.testing.assert_allclose(packed.class_weights, raw.class_weights)

    # 3. train via the CLI: packed train split + raw-PNG val split
    cfg_path = tmp_path / "cfg.yaml"
    save_dir = tmp_path / "ckpt"
    cfg_path.write_text(f"""
model:
  name: custom
  img_size: 32
  patch_size: 8
  embed_dim: 32
  depth: 1
  num_heads: 2
  num_classes: 14
data:
  batch_size: 16
  image_size: 32
  train_dir: {packed_dir}
  train_labels: {label_file}
  val_dir: {img_dir}
  val_labels: {label_file}
training:
  epochs: 1
  warmup_epochs: 1
  precision: fp32
  log_every: 2
paths:
  save_dir: {save_dir}
  log_dir: {tmp_path / 'logs'}
wandb:
  mode: disabled
""")
    out = _run(["scripts/train.py", "--config", str(cfg_path)])
    assert "Training completed" in out
    ckpts = [p for p in save_dir.iterdir() if p.name.startswith("checkpoint_")]
    assert ckpts, sorted(os.listdir(save_dir))

    # 4. evaluate via the CLI on the raw val split
    _run(["scripts/evaluate.py", "--config", str(cfg_path),
          "--checkpoint", str(save_dir / "best_model"), "--dataset", "nih"])
    results = json.loads(
        (save_dir / "evaluation" / "evaluation_results.json").read_text()
    )
    assert np.isfinite(results["metrics"]["mean_auc"])
    assert 0.0 <= results["metrics"]["mean_auc"] <= 1.0
