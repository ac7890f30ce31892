#!/bin/bash
# r5 queue 3: waits for queue2, then serve-load (TPU-measured latencies)
# and the full artifact chain.
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
for i in $(seq 1 240); do
  grep -q "r5 queue2 done" logs/r5_queue2.log 2>/dev/null && break
  sleep 60
done
echo "==== r5 queue3 start $(date) ====" >> logs/r5_queue3.log
python tools/r5_serve_load.py >> logs/r5_serve_load.log 2>&1
echo "serve_load rc=$?" >> logs/r5_queue3.log
bash tools/r5_artifact_chain.sh >> logs/r5_chain.log 2>&1
echo "artifact_chain rc=$?" >> logs/r5_queue3.log
echo "==== r5 queue3 done $(date) ====" >> logs/r5_queue3.log
