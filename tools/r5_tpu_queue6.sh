#!/bin/bash
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
for i in $(seq 1 420); do
  grep -q "r5 queue5 done" logs/r5_queue5.log 2>/dev/null && break
  sleep 60
done
echo "==== r5 queue6 start $(date) ====" >> logs/r5_queue6.log
python tools/r5_graph_recheck.py >> logs/r5_graph_recheck.log 2>&1
echo "graph_recheck rc=$?" >> logs/r5_queue6.log
echo "==== r5 queue6 done $(date) ====" >> logs/r5_queue6.log
