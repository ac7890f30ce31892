#!/bin/bash
# Full artifact chain on the TPU (VERDICT r4 #8): the five CLIs compose at
# the artifact level — pretrain_mae emits the .pth, train consumes it via
# model.pretrained_path, evaluate writes the battery with a held-out
# calibration split, export_serving packages the checkpoint, and the real
# serve.py handler stack serves it (in-process, clean shutdown — killing a
# TPU client process wedges the tunnel).
#
# Run detached: nohup tools/r5_artifact_chain.sh >> logs/r5_chain.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
OUT=/tmp/r5_chain
rm -rf $OUT && mkdir -p $OUT

# SMALL=1: CPU smoke with a tiny model (same chain, same CLIs)
EXTRA=""
if [ "$SMALL" = "1" ]; then
  EXTRA="--set model.name=custom --set model.img_size=32 \
         --set model.patch_size=8 --set model.embed_dim=64 \
         --set model.depth=2 --set model.num_heads=2 \
         --set data.image_size=32 --set data.batch_size=16 \
         --set data.synthetic_size=64"
fi

echo "== [1/5] pretrain_mae =="
python scripts/pretrain_mae.py --config configs/vit_b16_graph2.yaml \
  --synthetic --out $OUT/mae.pth \
  --set training.epochs=1 --set data.batch_size=128 \
  --set paths.save_dir=$OUT/mae_ckpt --set paths.log_dir=$OUT/logs \
  $EXTRA || exit 1

echo "== [2/5] train from the MAE init =="
python scripts/train.py --config configs/vit_b16_graph2.yaml --synthetic \
  --set model.pretrained_path=$OUT/mae.pth \
  --set training.epochs=2 --set training.warmup_epochs=1 \
  --set data.batch_size=128 \
  --set paths.save_dir=$OUT/ckpt --set paths.log_dir=$OUT/logs \
  $EXTRA || exit 1
BEST=$(ls $OUT/ckpt/*best* -d 2>/dev/null | head -1)
[ -z "$BEST" ] && BEST=$(python -c "
from gavit_tpu.utils import checkpoint as c
print(c.latest_checkpoint('$OUT/ckpt'))")
echo "checkpoint: $BEST"

echo "== [3/5] evaluate with held-out calibration =="
python scripts/evaluate.py --config configs/vit_b16_graph2.yaml \
  --checkpoint "$BEST" --dataset synthetic --calibration-frac 0.2 \
  --set paths.save_dir=$OUT/eval --set paths.log_dir=$OUT/logs \
  $EXTRA || exit 1

echo "== [4/5] export serving artifact =="
python scripts/export_serving.py --config configs/vit_b16_graph2.yaml \
  --checkpoint "$BEST" --out $OUT/artifact --precision bf16 \
  --buckets 1,8,32,64 $EXTRA || exit 1

echo "== [5/5] serve the artifact (in-process HTTP, one real request) =="
python - <<'EOF' || exit 1
import json
import threading
import urllib.request

import numpy as np

import gavit_tpu

gavit_tpu.setup_compilation_cache()
from gavit_tpu.serving import ExportedPredictor, MicroBatcher
from scripts.serve import GavitHTTPServer, build_handler

pred = ExportedPredictor("/tmp/r5_chain/artifact")
pred.warmup()
batcher = MicroBatcher(pred, max_wait_ms=2.0)
srv = GavitHTTPServer(("127.0.0.1", 0),
                      build_handler(pred, pred.image_size, "chain", batcher))
threading.Thread(target=srv.serve_forever, daemon=True).start()
url = f"http://127.0.0.1:{srv.server_address[1]}"
img = np.random.default_rng(0).integers(
    0, 255, (pred.image_size, pred.image_size, 3), np.uint8)
body = json.dumps(img.tolist()).encode()
req = urllib.request.Request(url + "/predict", data=body,
                             headers={"Content-Type": "application/json"})
resp = json.loads(urllib.request.urlopen(req, timeout=600).read())
probs = resp["probabilities"]
print("served probs[0][:4]:", np.asarray(probs).reshape(-1)[:4])
assert np.isfinite(np.asarray(probs, np.float32)).all()
health = urllib.request.urlopen(url + "/healthz", timeout=60).read()
print("healthz:", health.decode()[:80])
batcher.close()
srv.shutdown()
print("CHAIN OK")
EOF
echo "== artifact chain complete =="
ls -R $OUT/eval | head -40
