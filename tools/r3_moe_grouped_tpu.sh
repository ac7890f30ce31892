#!/bin/bash
# Grouped vs dense MoE engine on the TPU (sequential, ONE process at a
# time — killing TPU clients wedges the tunnel). Appends to the log.
#   nohup bash tools/r3_moe_grouped_tpu.sh >> logs/r3_moe_grouped.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=''
for spec in "grouped megablox" "grouped ragged_dot" "dense -"; do
  set -- $spec
  impl=$1; mm=$2
  echo "=== impl=$impl matmul=$mm $(date +%T)"
  if [ "$mm" = "-" ]; then
    python tools/r3_moe_tpu.py --impl "$impl" || echo "FAILED impl=$impl"
  else
    GAVIT_MOE_MATMUL=$mm python tools/r3_moe_tpu.py --impl "$impl" \
      || echo "FAILED impl=$impl matmul=$mm"
  fi
done
echo "=== done $(date +%T)"
