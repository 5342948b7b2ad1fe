#!/bin/bash
# Round-5 endgame: post-flood-fix closed-loop re-measurement at the
# documented scale (the recorded 40/120-epoch bPQ values in docs/PARITY.md
# were measured through the truncated watershed and are lower bounds).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
set -x
timeout 2400 python scripts/closed_loop_pannuke.py --out /tmp/cl40 --images 128 --epochs 40 --min-bpq 0 > results/closed_loop40_postfix.log 2>&1
echo CL40_DONE rc=$?
timeout 3600 python scripts/closed_loop_pannuke.py --out /tmp/cl120 --images 128 --epochs 120 --min-bpq 0 > results/closed_loop120_postfix.log 2>&1
echo CL120_DONE rc=$?
echo CL_QUEUE_DONE
