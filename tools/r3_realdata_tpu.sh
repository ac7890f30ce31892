#!/bin/bash
# Round-3: the full on-disk real-data path as ONE pipeline on the TPU
# (round-2 verdict #4): generated PNG corpus (reference label-file format)
# → prepare_dataset.py → packed memmap → scripts/train.py (ViT-S+graph1,
# 2 epochs) → scripts/evaluate.py. Records throughput for BASELINE.md.
#
# Usage: nohup bash tools/r3_realdata_tpu.sh >> logs/r3_realdata.log 2>&1 &
set -e
cd "$(dirname "$0")/.."
ROOT=/tmp/r3_realdata
rm -rf "$ROOT" && mkdir -p "$ROOT"

echo "=== generating PNG corpus $(date)"
python - <<'EOF'
import numpy as np
from pathlib import Path
from PIL import Image

root = Path("/tmp/r3_realdata")
img_dir = root / "images"; img_dir.mkdir(parents=True)
rng = np.random.default_rng(0)
n = 2048
labels = (rng.random((n, 14)) < 0.25).astype(np.float32)
lines = []
for i in range(n):
    name = f"img_{i:05d}.png"
    # 1024px grayscale like NIH source files → exercises real decode+resize
    arr = rng.integers(0, 256, (1024, 1024), np.uint8)
    Image.fromarray(arr, mode="L").save(img_dir / name)
    lines.append(name + " " + " ".join(f"{v:.0f}" for v in labels[i]))
    if (i + 1) % 512 == 0:
        print(f"wrote {i+1}/{n}", flush=True)
(root / "train_list.txt").write_text("\n".join(lines) + "\n")
EOF

echo "=== packing $(date)"
time python scripts/prepare_dataset.py \
  --image-dir "$ROOT/images" --labels "$ROOT/train_list.txt" \
  --out "$ROOT/packed" --image-size 224 --workers 8

echo "=== training (TPU, ViT-S+graph1, packed train + raw-PNG val) $(date)"
JAX_PLATFORMS='' python scripts/train.py --config configs/baseline_config.yaml \
  --set data.train_dir="$ROOT/packed" --set data.train_labels="$ROOT/train_list.txt" \
  --set data.val_dir="$ROOT/images" --set data.val_labels="$ROOT/train_list.txt" \
  --set data.batch_size=256 --set data.num_workers=8 \
  --set training.epochs=2 --set training.precision=bf16 \
  --set model.pretrained_path="" \
  --set wandb.mode=disabled \
  --set paths.save_dir="$ROOT/ckpt" --set paths.log_dir="$ROOT/logs"

echo "=== evaluating (raw-PNG val split) $(date)"
JAX_PLATFORMS='' python scripts/evaluate.py --config configs/baseline_config.yaml \
  --checkpoint "$ROOT/ckpt/best_model" --dataset nih \
  --set data.val_dir="$ROOT/images" --set data.val_labels="$ROOT/train_list.txt" \
  --set data.batch_size=64 --set data.num_workers=8 \
  --set paths.save_dir="$ROOT/ckpt"
python -c "
import json
d = json.load(open('$ROOT/ckpt/evaluation/evaluation_results.json'))
print('EVAL mean_auc', d['metrics']['mean_auc'],
      'p50_ms', d['p50_single_image_latency_ms'],
      'batch_lat', d.get('batch_latency_ms'))"
echo "=== pipeline done $(date)"
