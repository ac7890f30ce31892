#!/bin/bash
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
for i in $(seq 1 420); do
  grep -q "r5 queue4 done" logs/r5_queue4.log 2>/dev/null && break
  sleep 60
done
echo "==== r5 queue5 start $(date) ====" >> logs/r5_queue5.log
python tools/r5_misc_probe.py >> logs/r5_misc.log 2>&1
echo "misc rc=$?" >> logs/r5_queue5.log
python bench.py >> logs/r5_bench.log 2>&1
echo "bench rc=$?" >> logs/r5_queue5.log
echo "==== r5 queue5 done $(date) ====" >> logs/r5_queue5.log
