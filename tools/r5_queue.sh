#!/bin/bash
# Round-5 serial TPU queue, phase 1: bank a baseline bench number for the
# current defaults (cold cache on this machine), then run the full banked
# A/B sweep from round 4 (TODO.md runbook steps 1-2). One jax process at
# a time on the chip; everything logs to /tmp/r5_queue.log.
set -u
cd /root/repo
export PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=upb

echo "=== r5 queue phase 1 start: $(date) ==="
echo "--- step 1: bench.py (bank baseline, warm shared cache) ---"
timeout 3600 python bench.py 2>&1 | tail -5
echo "--- step 2: experiment_r4.sh sweep (base + 5 flags + bq_rank + ms2) ---"
bash tools/experiment_r4.sh
echo "=== r5 queue phase 1 done: $(date) ==="
