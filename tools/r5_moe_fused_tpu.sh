#!/bin/bash
# r5 fused grouped-MoE megakernel measurement queue (detached, one TPU
# client at a time — CLAUDE.md tunnel rules). Appends to the log.
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
LOG=logs/r5_moe_fused.log
run() {
  echo "=== $* [fused=${GAVIT_MOE_FUSED:-1}] $(date +%H:%M:%S) ===" >> $LOG
  python tools/r3_moe_tpu.py "$@" >> $LOG 2>&1
}
echo "==== r5 fused MoE queue start $(date) ====" >> $LOG
export GAVIT_MOE_FUSED=1
run --impl grouped --no-remat --batch 64
run --impl grouped --no-remat --batch 128
export GAVIT_MOE_FUSED=0
run --impl grouped --no-remat --batch 64
run --impl grouped --no-remat --batch 128
unset GAVIT_MOE_FUSED
run --impl dense --batch 64
run --impl dense --batch 128
echo "==== r5 fused MoE queue done $(date) ====" >> $LOG
