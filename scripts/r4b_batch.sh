#!/bin/bash
# Round-4b TPU queue (VERDICT r3 items 3, 2, 6). ONE TPU process at a time:
# waits for the XLA flag sweep (PID in /tmp/sweep.pid) before claiming the
# chip, and for the fixture generator to finish each dataset it needs.
#   D. cosine 4k confirm on the Soak B/F recipe      (item 3)
#   F. EMA 4k e2e with --ema_bn_recal on HEAD        (item 2)
#   E. 96-scene nuScenes soak at 12k steps           (item 6)
# All soaks use --watchdog_secs 300 --supervise 3 (the round-4 built-in
# restart contract) instead of per-experiment bash loops.
set -u
cd /root/repo
RUNS=/root/runs/r4b
mkdir -p "$RUNS"
STATUS=$RUNS/status.log
log() { echo "$(date +%F' '%H:%M:%S) $*" >> "$STATUS"; }

log "waiting for xla_flag_sweep (pid $(cat /tmp/sweep.pid 2>/dev/null))"
while kill -0 "$(cat /tmp/sweep.pid 2>/dev/null)" 2>/dev/null; do sleep 20; done
log "sweep done"

log "waiting for fix48"
while ! grep -q "fix48 done" "$RUNS/gen_fixtures.out" 2>/dev/null; do sleep 20; done
log "fix48 ready"

log "D: cosine 4k confirm (ablation table, ACCURACY.md)"
timeout 10800 python train_simbev.py --dataroot /tmp/fix48 --bsz 8 \
    --nworkers 3 --val_step 500 --viz_step 0 --resize_lim 0.70 0.85 \
    --compute_dtype bfloat16 --watchdog_secs 300 --supervise 3 \
    --logdir "$RUNS/abl_cosine4k" --max_steps 4000 \
    --lr_schedule cosine --warmup_steps 500 --decay_steps 4000 \
    > "$RUNS/abl_cosine4k.out" 2>&1
log "D rc=$?"

log "F: EMA 4k e2e (--ema_decay 0.999, BN recal default 16)"
timeout 10800 python train_simbev.py --dataroot /tmp/fix48 --bsz 8 \
    --nworkers 3 --val_step 500 --viz_step 0 --resize_lim 0.70 0.85 \
    --compute_dtype bfloat16 --watchdog_secs 300 --supervise 3 \
    --logdir "$RUNS/abl_ema4k" --max_steps 4000 \
    --ema_decay 0.999 \
    > "$RUNS/abl_ema4k.out" 2>&1
log "F rc=$?"

log "waiting for nusc_fix96"
while ! grep -q "nusc_fix96 done" "$RUNS/gen_fixtures.out" 2>/dev/null; do sleep 30; done
log "nusc_fix96 ready"

log "E: 96-scene nuScenes soak, 12k steps (upstream recipe)"
timeout 21600 python scripts/train_nuscenes.py --dataroot /tmp/nusc_fix96 \
    --bsz 8 --nworkers 3 --max_steps 12000 \
    --watchdog_secs 300 --supervise 3 \
    --logdir "$RUNS/nusc96_12k" \
    > "$RUNS/nusc96_12k.out" 2>&1
log "E rc=$?"
log "ALL DONE"
