#!/bin/bash
# Round-3 session-2 TPU batch (fresh machine: /root/runs and /tmp fixtures
# from session 1 are gone). Priorities from VERDICT r2:
#   A. e2e bf16 train step: baseline vs --fused_dw (verdict item 4 done-bar)
#   B. isolated Pallas fused dwconv+BN-stats vs XLA (diagnostic for A)
#   C. abl_ema_v2: EMA ablation with the ema_batch_stats fix (1ae6434)
#   D. abl_accum: accum_steps=4 at samples-matched 2k updates
#   E. int8 PTQ vs bf16 at the compute-bound stretch shapes (verdict item 3)
#   F. (time-permitting) 96-scene nuScenes rung (verdict item 5)
# ONE TPU process at a time (CLAUDE.md). Run as a FILE, not a heredoc.
set -u
cd /root/repo
RUNS=/root/runs/r3b
mkdir -p "$RUNS"
STATUS=$RUNS/status.log
log() { echo "$(date +%F' '%H:%M:%S) $*" >> "$STATUS"; }

log "A: e2e bf16 step baseline"
timeout 3600 python bench.py --mode step --dtype bfloat16 --iters 20 \
    > "$RUNS/step_baseline.json" 2> "$RUNS/step_baseline.err"
log "A baseline rc=$?"
timeout 3600 python bench.py --mode step --dtype bfloat16 --iters 20 --fused_dw \
    > "$RUNS/step_fused.json" 2> "$RUNS/step_fused.err"
log "A fused rc=$?"

log "B: isolated mbconv bench"
timeout 3600 python scripts/mbconv_bench.py --iters 50 \
    > "$RUNS/mbconv_bench.json" 2> "$RUNS/mbconv_bench.err"
log "B done rc=$?"

FIX=/tmp/fix48
for i in $(seq 1 120); do
  [ -f "$FIX/.done" ] && break
  sleep 30
done
if [ ! -f "$FIX/.done" ]; then log "fixture never appeared; skipping ablations"; else

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

log "C: abl_ema_v2 (ema_batch_stats fix)"
run_stage abl_ema_v2 --max_steps 4000 --ema_decay 0.999
log "D: abl_accum (2k updates x4 microbatches)"
run_stage abl_accum --max_steps 2000 --accum_steps 4
fi

log "E: stretch int8 vs bf16 inference (B4, 400x400, outC 4)"
timeout 5400 python scripts/stretch_bench.py --mode infer --bsz 4 --iters 10 \
    > "$RUNS/stretch_infer_bf16.json" 2> "$RUNS/stretch_infer_bf16.err"
log "E bf16 rc=$?"
timeout 5400 python scripts/stretch_bench.py --mode infer --bsz 4 --iters 10 --quantize \
    > "$RUNS/stretch_infer_int8.json" 2> "$RUNS/stretch_infer_int8.err"
log "E int8 rc=$?"

log "F: 96-scene nuScenes soak (upstream recipe), if fixture ready"
if [ -f /tmp/nusc_fix96/.done ]; then
  timeout 10800 python scripts/train_nuscenes.py --dataroot /tmp/nusc_fix96 \
      --bsz 8 --nworkers 3 --max_steps 6000 --watchdog_secs 300 \
      --logdir "$RUNS/nusc96" > "$RUNS/nusc96.out" 2>&1
  log "F done rc=$?"
else
  log "F skipped: no nusc_fix96 fixture"
fi
log "ALL DONE"
