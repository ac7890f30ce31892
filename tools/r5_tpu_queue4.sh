#!/bin/bash
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
for i in $(seq 1 360); do
  grep -q "r5 queue3 done" logs/r5_queue3.log 2>/dev/null && break
  sleep 60
done
echo "==== r5 queue4 start $(date) ====" >> logs/r5_queue4.log
python tools/r5_graph_topk_ab.py >> logs/r5_graph_topk.log 2>&1
echo "graph_topk rc=$?" >> logs/r5_queue4.log
GAVIT_BENCH_CLIENTS=128 python tools/bench_serve.py >> logs/r5_serve128.log 2>&1
echo "bench_serve_128 rc=$?" >> logs/r5_queue4.log
echo "==== r5 queue4 done $(date) ====" >> logs/r5_queue4.log
