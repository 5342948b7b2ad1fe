#!/bin/bash
# Closed-loop re-measurement with the fixed flood (the recorded 40/120-epoch
# numbers were measured through the truncated watershed)
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
set -x
timeout 3000 python scripts/closed_loop_pannuke.py --out /tmp/cl40 --images 128 --epochs 40 --min-bpq 0 > results/closed_loop40_postfix.log 2>&1
timeout 5400 python scripts/closed_loop_pannuke.py --out /tmp/cl120 --images 128 --epochs 120 --min-bpq 0 > results/closed_loop120_postfix.log 2>&1
echo CL_DONE
