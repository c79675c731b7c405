#!/bin/bash
# Round-3 TPU batch (VERDICT r2 item 1): bf16 config-of-record soak to the
# matched 12k-step length of ACCURACY.md Soak B, then a compact ablation of
# the shipped training extras (--ema_decay / --lr_schedule cosine /
# --accum_steps) on the same scale-robust recipe.
#
# One long-lived sequential shell: only ONE TPU process at a time
# (CLAUDE.md), each stage retried with --resume on watchdog hard-exit 42
# (axon tunnel hang recovery). Run as a FILE, not a heredoc, so stragglers
# are findable.
set -u
cd /root/repo
RUNS=/root/runs/r3
mkdir -p "$RUNS"
STATUS=$RUNS/status.log
log() { echo "$(date +%F' '%H:%M:%S) $*" >> "$STATUS"; }

FIX=/tmp/fix48
if [ ! -d "$FIX" ]; then
  log "generating 48-scene fixture at $FIX"
  python -c "from lss_carla_tpu.data.fixtures import generate_fixture; \
             generate_fixture('$FIX', num_scenes=48, samples_per_scene=32, seed=11)" \
      >> "$STATUS" 2>&1 || { log "FIXTURE FAILED"; exit 1; }
fi

run_stage() {
  name=$1; shift
  logdir=$RUNS/$name
  if [ -f "$logdir/.stage_done" ]; then log "stage $name already done, skip"; return; fi
  log "stage $name START ($*)"
  python train_simbev.py --dataroot "$FIX" --bsz 8 --nworkers 3 \
      --val_step 500 --viz_step 0 --resize_lim 0.70 0.85 \
      --compute_dtype bfloat16 --watchdog_secs 300 \
      --logdir "$logdir" "$@" > "$RUNS/$name.out" 2>&1
  rc=$?
  tries=0
  while [ $rc -eq 42 ] && [ $tries -lt 3 ]; do
    tries=$((tries+1))
    log "stage $name watchdog exit 42, resume attempt $tries"
    python train_simbev.py --dataroot "$FIX" --bsz 8 --nworkers 3 \
        --val_step 500 --viz_step 0 --resize_lim 0.70 0.85 \
        --compute_dtype bfloat16 --watchdog_secs 300 \
        --logdir "$logdir" --resume "$logdir/ckpts" "$@" >> "$RUNS/$name.out" 2>&1
    rc=$?
  done
  log "stage $name DONE rc=$rc"
  [ $rc -eq 0 ] && touch "$logdir/.stage_done"
}

# 1. Matched-length bf16 soak (Soak B recipe, 12k steps).
run_stage soak_bf16_12k --max_steps 12000
# 2-4. Training-extras ablations, 4k optimizer steps each (accum stage uses
#      2k updates = 8k microbatches: samples-matched to 8k baseline steps).
run_stage abl_ema    --max_steps 4000 --ema_decay 0.999
run_stage abl_cosine --max_steps 4000 --lr_schedule cosine --warmup_steps 500 --decay_steps 4000
run_stage abl_accum  --max_steps 2000 --accum_steps 4
log "ALL DONE"
