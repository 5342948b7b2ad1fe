#!/bin/bash
# VERDICT r4 task 3b: PQ-delta at production 1024^2 (>=50 tiles, 40x and 20x, model source)
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
set -x
timeout 5400 python -m cellvit_tpu.eval.pq_delta --size 1024 --tiles 56 --levels 64 128 --magnification 40 > results/pq1024_m40.json 2> results/pq1024_m40.err
timeout 5400 python -m cellvit_tpu.eval.pq_delta --size 1024 --tiles 56 --levels 64 128 --magnification 20 > results/pq1024_m20.json 2> results/pq1024_m20.err
timeout 5400 python -m cellvit_tpu.eval.pq_delta --size 1024 --tiles 56 --levels 64 128 --magnification 40 --source model > results/pq1024_model.json 2> results/pq1024_model.err
echo DONE_ALL
