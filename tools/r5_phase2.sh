#!/bin/bash
# Round-5 serial TPU queue, phase 2 — run AFTER the phase-1 sweep
# (tools/r5_queue.sh) has been analyzed and winning flags flipped into
# defaults. Strict serial order, one jax process on the chip at a time.
#
#   bash tools/r5_phase2.sh           # all steps
#   bash tools/r5_phase2.sh b12 b16   # a subset
set -u
cd /root/repo
export PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=upb

step () { echo "=== phase2 step: $* ($(date)) ==="; }

run_b () {
  step "bench batch $1"
  timeout 5400 python bench.py --batch "$1" 2>&1 | tail -4
}

ALL="default b12 b16 merging train5k b32diag"
SEL="${*:-$ALL}"
for s in $SEL; do
  case "$s" in
    default)
      # record the new default config + warm its cache for the driver
      run_b 8 ;;
    b12) run_b 12 ;;
    b16) run_b 16 ;;
    merging)
      # bank a BDM-Merging throughput number (verdict r4 item 5)
      step "bench merging"
      timeout 5400 python bench.py --sampler merging 2>&1 | tail -4 ;;
    train5k)
      # bf16 5k-step training demo at production shapes (verdict item 4)
      step "train 5k bf16"
      # dataset.max_points=4096 is REQUIRED: the config default mirrors the
      # reference's 16384, and at N=16384 the sa0 ball-query kernel's
      # scoped-vmem stack (32.75M) exceeds Mosaic's 16M limit in the
      # train-step executable (measured r5)
      timeout 14400 python -m bdm_tpu.main run.job=train dataset=synthetic \
        dataset.max_points=4096 \
        run.max_steps=5000 run.val_freq=1000 run.checkpoint_freq=2500 \
        run.vis_freq=5000 run.name=pc2_synth_bf16_5k 2>&1 | tail -15
      cp outputs/pc2_synth_bf16_5k/train_log.jsonl \
         docs/train_log_pc2_synth_bf16_5k.jsonl 2>/dev/null || \
        echo "train log not found where expected" ;;
    b32diag)
      # diagnose the r3 b32 compile hang (verdict item 6): bounded, with
      # compile logging; a timeout here is DATA (documents the limit),
      # not a stall — the supervisor always emits JSON
      step "b32 diagnosis (bounded 45 min)"
      BDM_BENCH_DEADLINE=2400 timeout 2700 python bench.py --batch 32 \
        2> /tmp/b32_diag.log | tail -2
      tail -5 /tmp/b32_diag.log ;;
    *) echo "unknown step $s" ;;
  esac
done
echo "=== phase 2 done: $(date) ==="
