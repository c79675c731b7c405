#!/bin/bash
# Round-4d TPU queue — stretch-config accuracy soak (runs after r4c).
#   J. 400x400 @0.25m multiclass B4 bf16, cosine 4k, single chip:
#      the TPU-native scale-up target's FIRST accuracy curve
#      (configs/simbev_stretch.sh so far had only the ~100 ms/step
#      perf number; per-class val IoU logs as val/iou_c{i}).
set -u
cd /root/repo
RUNS=/root/runs/r4b
STATUS=$RUNS/status.log
log() { echo "$(date +%F' '%H:%M:%S) $*" >> "$STATUS"; }

log "r4d: waiting for r4c"
while ! grep -q "r4c ALL DONE" "$STATUS" 2>/dev/null; do sleep 30; done
while ! grep -q "fix_stretch done" "$RUNS/gen_stretch.out" 2>/dev/null; do sleep 30; done

log "J: stretch accuracy soak (400x400 multiclass B4 bf16, cosine 4k)"
timeout 14400 python train_simbev.py --dataroot /tmp/fix_stretch --bsz 4 \
    --nworkers 3 --val_step 500 --viz_step 0 --resize_lim 0.70 0.85 \
    --xbound -50.0 50.0 0.25 --ybound -50.0 50.0 0.25 \
    --label_mode multiclass --variant b4 \
    --compute_dtype bfloat16 --watchdog_secs 600 --supervise 3 \
    --logdir "$RUNS/abl_stretch4k" --max_steps 4000 \
    --lr_schedule cosine --warmup_steps 500 --decay_steps 4000 \
    > "$RUNS/abl_stretch4k.out" 2>&1
log "J rc=$?"
log "r4d ALL DONE"
