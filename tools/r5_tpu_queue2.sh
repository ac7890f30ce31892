#!/bin/bash
# r5 queue 2: graph large-N, pp-in-shard_map smoke, QAT flagship A/B
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
echo "==== r5 queue2 start $(date) ====" >> logs/r5_queue2.log
python tools/r5_graph_bigN.py >> logs/r5_graph_bigN.log 2>&1
echo "graph_bigN rc=$?" >> logs/r5_queue2.log
python tools/r5_pp_tpu_smoke.py >> logs/r5_pp_smoke.log 2>&1
echo "pp_smoke rc=$?" >> logs/r5_queue2.log
python tools/r5_qat_vitb.py >> logs/r5_qat_vitb.log 2>&1
echo "qat_vitb rc=$?" >> logs/r5_queue2.log
echo "==== r5 queue2 done $(date) ====" >> logs/r5_queue2.log
