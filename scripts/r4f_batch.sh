#!/bin/bash
# Round-4f TPU queue (final) — after the r4b nuScenes soak:
#   J. stretch accuracy soak (400x400 multiclass B4 bf16, cosine 4k)
#   G. EMA + cosine combined 4k — ONLY if it can start before the cutoff
#      hour, so the chip is free for the end-of-round bench.
# CUTOFF_H: no new soak starts at/after this local hour (default 05).
set -u
cd /root/repo
RUNS=/root/runs/r4b
STATUS=$RUNS/status.log
CUTOFF_H=${CUTOFF_H:-05}
log() { echo "$(date +%F' '%H:%M:%S) $*" >> "$STATUS"; }

log "r4f: waiting for r4b stage E"
while ! grep -q "E rc=" "$STATUS" 2>/dev/null; do sleep 30; done

log "J: stretch accuracy soak (400x400 multiclass B4 bf16, cosine 4k)"
timeout 7200 python train_simbev.py --dataroot /tmp/fix_stretch --bsz 4 \
    --nworkers 3 --val_step 500 --viz_step 0 --resize_lim 0.70 0.85 \
    --xbound -50.0 50.0 0.25 --ybound -50.0 50.0 0.25 \
    --label_mode multiclass --variant b4 \
    --compute_dtype bfloat16 --watchdog_secs 600 --supervise 3 \
    --logdir "$RUNS/abl_stretch4k" --max_steps 4000 \
    --lr_schedule cosine --warmup_steps 500 --decay_steps 4000 \
    > "$RUNS/abl_stretch4k.out" 2>&1
log "J rc=$?"

if [ "$(date +%H)" -lt "$CUTOFF_H" ]; then
    log "G: EMA + cosine combined 4k"
    timeout 7200 python train_simbev.py --dataroot /tmp/fix48 --bsz 8 \
        --nworkers 3 --val_step 500 --viz_step 0 --resize_lim 0.70 0.85 \
        --compute_dtype bfloat16 --watchdog_secs 300 --supervise 3 \
        --logdir "$RUNS/abl_emacos4k" --max_steps 4000 \
        --lr_schedule cosine --warmup_steps 500 --decay_steps 4000 \
        --ema_decay 0.999 \
        > "$RUNS/abl_emacos4k.out" 2>&1
    log "G rc=$?"
else
    log "G SKIPPED (past cutoff hour $CUTOFF_H — chip left free for bench)"
fi
log "r4f ALL DONE"
