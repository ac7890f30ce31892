#!/bin/bash
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
echo "==== r5 queue7 start $(date) ====" >> logs/r5_queue7.log
python tools/r5_graph_bigN.py >> logs/r5_graph_bigN2.log 2>&1
echo "graph_bigN(iter) rc=$?" >> logs/r5_queue7.log
python tools/r5_misc_probe.py >> logs/r5_misc2.log 2>&1
echo "misc(retry) rc=$?" >> logs/r5_queue7.log
echo "==== r5 queue7 done $(date) ====" >> logs/r5_queue7.log
