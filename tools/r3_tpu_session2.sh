#!/bin/bash
# Session-2 TPU sequence: grouped-vs-dense MoE engines, then bench.py at HEAD.
# ONE process at a time (killing TPU clients wedges the tunnel).
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=''
bash tools/r3_moe_grouped_tpu.sh
echo "=== bench.py at HEAD $(date +%T)"
python bench.py || echo "FAILED bench"
echo "=== all done $(date +%T)"
