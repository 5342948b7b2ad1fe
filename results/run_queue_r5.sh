#!/bin/bash
# Round-5 TPU measurement queue (sequential; one heavy job at a time)
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
set -x
timeout 5400 python -m cellvit_tpu.eval.pq_delta --size 1024 --tiles 56 --levels 64 128 --magnification 40 > results/pq1024_m40.json 2> results/pq1024_m40.err
timeout 5400 python -m cellvit_tpu.eval.pq_delta --size 1024 --tiles 56 --levels 64 128 --magnification 20 > results/pq1024_m20.json 2> results/pq1024_m20.err
timeout 5400 python -m cellvit_tpu.eval.pq_delta --size 1024 --tiles 56 --levels 64 128 --magnification 40 --source model > results/pq1024_model.json 2> results/pq1024_model.err
timeout 3600 python scripts/wsi_timings_run.py --out /tmp/wsi_timings > results/wsi_run.log 2>&1
cp /tmp/wsi_timings/wsi_timings_summary.json results/ 2>/dev/null
timeout 4500 python scripts/decoder_stage_probe.py > results/probe.log 2>&1
echo QUEUE_DONE
